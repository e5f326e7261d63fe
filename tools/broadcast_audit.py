"""Estimator-blindness audit: find corpus-scaled broadcasts the
planner picks at scaled-up stats (SCALE.md round-11 frontier item 1,
delivered round 10).

The round-10 dd_prefix_pairs failure generalizes: Catalyst's size
estimator cannot see explode/groupBy fan-out, so a join side that
SCALES WITH THE CORPUS can stay under the broadcast threshold in the
estimate while being gigabytes in reality — invisible at small SF,
fatal (TaskResultLost / driver OOM) once memory is tight. This tool
builds the PLAN (no execution) of every documents/embeddings-axis
catalog entry against a 10× parquet expansion and reports each
BroadcastExchange whose subtree contains a Generate (explode) or a
raw documents/embeddings file scan — the two textual signatures of a
corpus-scaled side.

Hits are candidates, not verdicts: a broadcast over a scan capped by
Limit/TakeOrdered, reduced to a B-bounded key space by an aggregate,
or filtered to a constant-size config is bounded BY DESIGN and fine.
The tool prints the evidence (subtree snippet) so each hit can be
adjudicated in SCALE.md; the goal state is zero UNadjudicated hits.

Run from the repo root (expect a few minutes — some entries train
models at plan-build time):

    python tools/broadcast_audit.py [--scale=10] [name_filter ...]

Prints one line per hit and a final JSON summary.
"""

from __future__ import annotations

import json
import re
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# documents/embeddings-axis entries (the corpus side); tpch entries
# join fact tables whose scan estimates are honest (file-based), so
# the blindness class doesn't apply the same way there.
DEFAULT_PREFIXES = ("dd_", "txt_", "emb_", "sim_", "x_", "pipe_", "mm_")

# Adjudicated-OK broadcasts, by entry, each with its reason CLASS
# (round 11 — the round-10 set plus the entries surfaced when the
# 'any aggregate bounds' false-negative was removed). The classes:
#
# honest_thin — agg-topped scalar side (fingerprint→min-id survivor
#   tables, per-doc count/length tables): output rows are LINEAR in
#   the corpus and the estimator sees both the width and the growth
#   honestly, so at real scale the estimate crosses the threshold and
#   static planning/AQE flips to SMJ on its own; broadcast is the
#   correct mid-scale plan and hinting would only slow it. (The
#   round-10 adjudication rule, now applied per entry.)
# bounded_keyspace — agg keys are a DESIGN constant's keyspace (bloom
#   bit positions, simhash chunk×piece signature space with the ≤1000
#   bucket cap, DSIR's B=10k hash buckets, x_global_shuffle's fixed
#   salt buckets): output cardinality cannot exceed the constant no
#   matter the corpus.
# vocab_sublinear — unigram word→count tables (DF/IDF/rarity/unigram
#   LM mass): vocabulary grows sublinearly (Heaps' law) and the
#   broadcast IS the scale plan — the alternative shuffles the
#   exploded corpus word stream, strictly worse; the standard
#   map-side-join call. (The BIGRAM table is NOT in this class — its
#   keyspace is near-corpus unpruned, so bigram_lm_scores merge-joins
#   it; round-11 fix.)
# bounded_delta — dd_incremental*'s broadcast side is the incremental
#   BATCH's banded keys: in production that is the delta, bounded by
#   batch sizing policy, and broadcasting it against the big history
#   index is exactly the intended plan.
#
# Width-blind ARRAY-carrying corpus sides are never adjudicated —
# that class is fixed with merge hints at the operator sites
# (SCALE.md round-10; _shingle_sharing_candidates and bigram c12
# added round-11).
ADJUDICATED_OK = {
    "dd_incremental": "bounded_delta",
    "dd_incremental_verified": "bounded_delta",
    "dd_fuzzy_decontaminate": "honest_thin",
    "pipe_dedup_funnel": "honest_thin",
    "dd_exact": "honest_thin",
    "dd_exact_normalized": "honest_thin",
    "pipe_curation": "honest_thin",
    "dd_decontaminate": "honest_thin",
    "dd_substring_spans": "honest_thin",
    "dd_substring_remove": "honest_thin",
    "x_split_decontaminate": "honest_thin",
    "txt_char_entropy": "honest_thin",
    "txt_bm25": "honest_thin (doc-length table) + vocab_sublinear (DF)",
    "dd_simhash": "honest_thin (dupe-id set; 100x/2GiB zero-spill gate)",
    # r14: the blocked-cosine numpy kernel made the loser side a plain
    # distinct over the kernel output, so the audit now sees the same
    # dupe-id-set anti-join broadcast dd_simhash has always carried
    # (before, the id set hid behind the self-join's projection).
    # Same adjudication: an 8-byte id per DUPLICATE is the thin
    # decision set (guide §8); the alternative shuffles the corpus
    # for a sort-merge anti join.
    "dd_embedding": "honest_thin (dupe-id set, same class as dd_simhash)",
    "dd_bloom_cert": "bounded_keyspace (bloom bit positions)",
    "dd_simhash_probed": "bounded_keyspace (chunk x piece, <=1000 cap)",
    "dd_simhash_probed_verified": "bounded_keyspace (chunk x piece, <=1000 cap)",
    "x_dsir_weights": "bounded_keyspace (B=10k hash buckets)",
    "x_global_shuffle": "bounded_keyspace (fixed salt buckets)",
    "dd_lines": (
        "vocab_sublinear (boilerplate line-hash set: lines repeated "
        "across >=min_df docs are template/chrome, Zipf-bounded — "
        "map-side verdict lookup per line is the RefinedWeb plan; "
        "documented in line_dedup's docstring)"
    ),
    "txt_tfidf": "vocab_sublinear",
    "txt_pmi": "vocab_sublinear",
    "txt_word_rarity": "vocab_sublinear",
    "txt_lm_score": "vocab_sublinear (unigram side; bigram side merge-joined)",
}

# plan-build for these RUNS heavy jobs (training/iteration) at the
# scaled size — minutes each at 10×; skip unless explicitly named.
SKIP_HEAVY_BUILDERS = {
    "sim_ann_pq",
    "sim_ann_pq_verified",
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_verified",
    "txt_bpe_tokens",
    "txt_bpe_roundtrip",
    "dd_clusters",
    "dd_clusters_verified",
    "x_pagerank",
}


# Grouping-key name classes for aggregate-bounded broadcasts. An
# aggregate bounds the broadcast only if its key CARDINALITY is
# bounded: global aggs (no keys) and aggs keyed on design-bounded
# spaces (bands, cells, codes, segments…) are fine; an agg keyed on a
# per-document / per-vector id has corpus cardinality — its output is
# exactly as many rows as the corpus, so it does NOT bound the
# broadcast (the advisor's round-10 false-negative class).
BOUNDED_KEY_RE = re.compile(
    r"\b(band|bucket|cell|probe|cluster|centroid|code|codebook|lane|sub"
    r"|seg(ment)?|lang|event_type|source|split|label|grp|group|bin"
    r"|quantile|topic|sig|r|m|k)\d*#",
    re.I,
)
CORPUS_KEY_RE = re.compile(
    r"\b(doc_id|vec_id|event_id|left[a-z_]*|right[a-z_]*|a_id|b_id|id"
    r"|url|fingerprint|fp|hash\w*|text|line|shingle|ngram|token\w*)\d*#",
    re.I,
)


def _first_agg_keys(sub: str) -> tuple[bool, str] | None:
    """(keys_are_bounded, keys_text) for the aggregate node NEAREST the
    BroadcastExchange (the shallowest one — it determines the broadcast
    row count), or None if the subtree has no aggregate."""
    m = re.search(
        r"(?:HashAggregate|ObjectHashAggregate|SortAggregate)"
        r"\(keys=\[([^\]]*)\]",
        sub,
    )
    if not m:
        return None
    keys = m.group(1).strip()
    if not keys:
        return True, keys  # global aggregate: one row
    if CORPUS_KEY_RE.search(keys):
        return False, keys  # corpus-cardinality key space
    if BOUNDED_KEY_RE.search(keys):
        return True, keys
    # unknown key names: conservative — needs adjudication
    return False, keys


def _subtrees(plan: str, marker: str):
    """Yield (line_index, subtree_text) for each `marker` node, using
    the toString tree's indentation to find the subtree extent."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if marker not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-*"))
        block = [line]
        for nxt in lines[i + 1 :]:
            nindent = len(nxt) - len(nxt.lstrip(" :+-*"))
            if nxt.strip() and nindent <= indent:
                break
            block.append(nxt)
        yield i, "\n".join(block)


def main() -> int:
    scale = 10
    filters: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--scale="):
            scale = int(a.split("=", 1)[1])
        else:
            filters.append(a)

    from dataframe_sql_spark.session import get_spark

    import bench

    spark = get_spark("broadcast_audit")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    d = bench._write_scaled_dir(spark, "/root/testdata/sf0.1", scale, "docs")
    hits: list[dict] = []
    built = skipped = errors = 0
    try:
        import __spark_entry__ as entrymod

        for name, fn in entrymod.queries().items():
            if filters:
                if not any(f in name for f in filters):
                    continue
            elif not name.startswith(DEFAULT_PREFIXES):
                continue
            if name in SKIP_HEAVY_BUILDERS and not filters:
                skipped += 1
                continue
            try:
                df = fn(spark, d)
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as e:
                errors += 1
                print(f"BUILD_ERROR {name}: {type(e).__name__}: {str(e)[:120]}")
                continue
            built += 1
            for _, sub in _subtrees(plan, "BroadcastExchange"):
                corpus_scan = re.search(
                    r"FileScan parquet .*(documents|embeddings)", sub
                )
                # any Generate (explode/posexplode/inline/UDTF) is a
                # row fan-out the size estimator cannot see
                has_explode = "Generate " in sub
                if not (corpus_scan or has_explode):
                    continue
                # A LIMIT between the broadcast and the scan bounds the
                # broadcast volume by k, not corpus bytes. An AGGREGATE
                # bounds it only when its grouping-key cardinality is
                # bounded (global aggs, band/cell/code-keyed score
                # tables, capped vocab lists); an agg keyed on
                # doc_id/vec_id outputs one row PER CORPUS ROW — e.g. a
                # groupBy(doc_id) collect_list of shingles is still a
                # corpus-sized broadcast, so it stays a hit (advisor's
                # round-10 false-negative class). A broadcast whose
                # subtree reaches the corpus scan (or an explode)
                # through only row-preserving ops is the prefix_pairs
                # class: its size IS the corpus.
                if re.search(
                    r"TakeOrderedAndProject|GlobalLimit|CollectLimit", sub
                ):
                    continue
                agg = _first_agg_keys(sub)
                if agg is not None and agg[0]:
                    continue  # bounded-key or global aggregate
                kind = (
                    "corpus_keyed_aggregate" if agg is not None
                    else "row_preserving"
                )
                hits.append(
                    {
                        "entry": name,
                        "kind": kind,
                        "agg_keys": agg[1] if agg else None,
                        "explode_in_subtree": has_explode,
                        "corpus_scan": bool(corpus_scan),
                        "snippet": " | ".join(
                            l.strip()[:70] for l in sub.splitlines()[:4]
                        ),
                    }
                )
                print(
                    f"HIT {name}: kind={kind} explode={has_explode} "
                    f"corpus_scan={bool(corpus_scan)}"
                    + (f" agg_keys={agg[1][:60]}" if agg else "")
                )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "broadcast_audit",
                "scale": scale,
                "entries_built": built,
                "skipped_heavy": skipped,
                "build_errors": errors,
                "raw_corpus_broadcasts": len(hits),
                "unadjudicated": sorted(
                    {h["entry"] for h in hits} - set(ADJUDICATED_OK)
                ),
                "hit_entries": sorted({h["entry"] for h in hits}),
                "hit_details": hits[:30],
                "wall_sec": round(time.perf_counter() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
