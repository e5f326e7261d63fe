"""Differential tests mirroring the reference's own test corpus
(/root/reference/dataframe_sql/tests/pandas_sql_functionality_test.py)
on synthetic fixtures shaped like FIXTURES.md: forest_fires-like and
digimon-like tables (including the deliberate schema stresses: mixed
case `RH`, column names with spaces, colliding `Type` columns).

Oracles are hand-written pandas, exactly like the reference's
methodology (SURVEY.md §5.1); comparison is order-insensitive except
for ORDER BY tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

RNG = np.random.RandomState(7)
N = 200

FOREST = pd.DataFrame(
    {
        "X": RNG.randint(1, 10, N),
        "Y": RNG.randint(2, 10, N),
        "month": RNG.choice(["jan", "mar", "aug", "oct", "nov"], N),
        "day": RNG.choice(["mon", "tue", "fri", "sat", "sun"], N),
        "temp": np.round(RNG.uniform(2, 33, N), 1),
        "RH": RNG.randint(15, 100, N),
        "wind": np.round(RNG.uniform(0.4, 9.4, N), 1),
        "rain": np.where(RNG.rand(N) < 0.9, 0.0, np.round(RNG.uniform(0.1, 6), 1)),
        "area": np.where(RNG.rand(N) < 0.5, 0.0, np.round(RNG.uniform(0.1, 300), 2)),
    }
)

ATTRS = ["Neutral", "Fire", "Water", "Plant", "Electric"]
MON = pd.DataFrame(
    {
        "Number": range(1, 41),
        "Digimon": [f"mon_{i}" for i in range(1, 41)],
        "Type": RNG.choice(["Free", "Virus", "Vaccine", "Data"], 40),
        "Attribute": RNG.choice(ATTRS, 40),
        "Memory": RNG.randint(2, 20, 40),
        "Equip Slots": RNG.randint(0, 4, 40),
        "Lv 50 HP": RNG.randint(500, 2000, 40),
    }
)
MON["mon_attribute"] = MON["Attribute"]

MOVE = pd.DataFrame(
    {
        "Move": [f"move_{i}" for i in range(60)],
        "SP Cost": RNG.randint(1, 30, 60),
        "Type": RNG.choice(["Physical", "Magic", "Support"], 60),
        "Attribute": RNG.choice(ATTRS, 60),
        "Power": RNG.randint(0, 120, 60),
        "move_attribute": lambda: None,
    }
)
MOVE["move_attribute"] = MOVE["Attribute"]


@pytest.fixture(scope="module", autouse=True)
def fixtures(engine):
    engine.register_temp_table(FOREST, "forest_fires")
    engine.register_temp_table(MON, "digimon_mon_list")
    engine.register_temp_table(MOVE, "digimon_move_list")
    yield
    for t in ("forest_fires", "digimon_mon_list", "digimon_move_list"):
        engine.remove_temp_table(t)


def eq(spark_pdf: pd.DataFrame, oracle: pd.DataFrame, ordered: bool = False):
    oracle = oracle.reset_index(drop=True)
    assert list(spark_pdf.columns) == list(oracle.columns), (
        spark_pdf.columns,
        oracle.columns,
    )
    if not ordered:
        cols = list(oracle.columns)
        spark_pdf = spark_pdf.sort_values(cols, kind="mergesort").reset_index(drop=True)
        oracle = oracle.sort_values(cols, kind="mergesort").reset_index(drop=True)
    else:
        spark_pdf = spark_pdf.reset_index(drop=True)
    pd.testing.assert_frame_equal(spark_pdf, oracle, check_dtype=False)


# --- ref :33-40 / :43-50 --------------------------------------------------


def test_select_star(engine):
    eq(engine.query_pandas("select * from forest_fires"), FOREST)


def test_case_insensitive_table(engine):
    eq(engine.query_pandas("select * from FOREST_fires"), FOREST)


# --- ref :53-62, :487-494 -------------------------------------------------


def test_projection_case_as_typed(engine):
    out = engine.query_pandas("select temp, rh from forest_fires")
    oracle = FOREST[["temp", "RH"]].rename(columns={"RH": "rh"})
    eq(out, oracle)


def test_alias(engine):
    out = engine.query_pandas("select rain as water, temp from forest_fires")
    oracle = FOREST[["rain", "temp"]].rename(columns={"rain": "water"})
    eq(out, oracle)


# --- ref :65-94, :1062-1111 ----------------------------------------------


def test_type_conversion(engine):
    out = engine.query_pandas(
        "select cast(temp as int64) as t_int, cast(RH as float64) as rh_f, "
        "cast(X as object) as x_s, cast(rain as bool) as rain_b from forest_fires"
    )
    oracle = pd.DataFrame(
        {
            "t_int": FOREST["temp"].astype("int64"),
            "rh_f": FOREST["RH"].astype("float64"),
            "x_s": FOREST["X"].astype(str),
            "rain_b": FOREST["rain"] != 0,
        }
    )
    eq(out, oracle)


# --- ref :97-105, :1114-1147 ----------------------------------------------


def test_math_precedence(engine):
    out = engine.query_pandas(
        "select temp, 1 + 2 * 3 as my_number, temp * wind + rain / 2 as expr2 "
        "from forest_fires"
    )
    oracle = pd.DataFrame(
        {
            "temp": FOREST["temp"],
            "my_number": 7,
            "expr2": FOREST["temp"] * FOREST["wind"] + FOREST["rain"] / 2,
        }
    )
    eq(out, oracle)


# --- ref :108-118, :121-128 ----------------------------------------------


def test_distinct(engine):
    out = engine.query_pandas("select distinct month from forest_fires")
    eq(out, FOREST[["month"]].drop_duplicates())


def test_subquery(engine):
    out = engine.query_pandas(
        "select * from (select area, rain from forest_fires) rain_area"
    )
    eq(out, FOREST[["area", "rain"]])


# --- ref :131-186 join matrix --------------------------------------------


@pytest.mark.parametrize(
    "join_sql,how",
    [
        ("join", "inner"),
        ("inner join", "inner"),
        ("left join", "left"),
        ("left outer join", "left"),
        ("right join", "right"),
        ("right outer join", "right"),
        ("full join", "outer"),
        ("full outer join", "outer"),
    ],
)
def test_join_matrix(engine, join_sql, how):
    out = engine.query_pandas(
        f"select digimon_mon_list.Number, digimon_move_list.Power from digimon_mon_list "
        f"{join_sql} digimon_move_list "
        f"on digimon_mon_list.attribute = digimon_move_list.attribute"
    )
    oracle = (
        MON.merge(MOVE, how=how, on="Attribute")[["Number", "Power"]]
        .rename(columns=str)
    )
    eq(out, oracle)


def test_cross_join(engine):
    out = engine.query_pandas(
        "select digimon_mon_list.Number, digimon_move_list.Move from digimon_mon_list "
        "cross join digimon_move_list"
    )
    oracle = MON.assign(__k=1).merge(MOVE.assign(__k=1), on="__k")[["Number", "Move"]]
    eq(out, oracle)


def test_comma_join_collision_prefixes(engine):
    out = engine.query_pandas("select * from digimon_mon_list, digimon_move_list")
    assert "digimon_mon_list.Type" in out.columns
    assert "digimon_move_list.Type" in out.columns
    assert "digimon_mon_list.Attribute" in out.columns
    assert "Number" in out.columns  # non-colliding stays bare
    assert len(out) == len(MON) * len(MOVE)


# --- columns with spaces (FIXTURES.md schema stress) ----------------------


def test_column_with_spaces(engine):
    out = engine.query_pandas(
        'select Digimon, "Equip Slots", "Lv 50 HP" from digimon_mon_list '
        'where "Equip Slots" > 1'
    )
    oracle = MON.loc[MON["Equip Slots"] > 1, ["Digimon", "Equip Slots", "Lv 50 HP"]]
    eq(out, oracle)


# --- ref :189-298 aggregates ---------------------------------------------


def test_agg_colN(engine):
    out = engine.query_pandas(
        "select min(temp), max(temp), avg(temp), max(wind) from forest_fires"
    )
    assert list(out.columns) == ["_col0", "_col1", "_col2", "_col3"]
    assert out["_col0"][0] == FOREST["temp"].min()
    assert out["_col1"][0] == FOREST["temp"].max()
    assert abs(out["_col2"][0] - FOREST["temp"].mean()) < 1e-9
    assert out["_col3"][0] == FOREST["wind"].max()


def test_group_by_having(engine):
    out = engine.query_pandas(
        "select month, sum(area) as s from forest_fires group by month "
        "having sum(area) > 100"
    )
    oracle = (
        FOREST.groupby("month", as_index=False)
        .agg(s=("area", "sum"))
        .query("s > 100")
    )
    eq(out, oracle)


# --- ref :301-358 where/order/limit --------------------------------------


def test_where_multi_predicate(engine):
    out = engine.query_pandas(
        "select temp from forest_fires "
        "where (month = 'mar' and temp > 8) or (day = 'fri' and rain != 0)"
    )
    m = ((FOREST["month"] == "mar") & (FOREST["temp"] > 8)) | (
        (FOREST["day"] == "fri") & (FOREST["rain"] != 0)
    )
    eq(out, FOREST.loc[m, ["temp"]])


def test_order_by_limit(engine):
    out = engine.query_pandas(
        "select temp, wind from forest_fires order by temp desc, wind asc, RH limit 10"
    )
    oracle = (
        FOREST.sort_values(
            ["temp", "wind", "RH"], ascending=[False, True, True], kind="mergesort"
        )[["temp", "wind"]]
        .head(10)
    )
    eq(out, oracle, ordered=True)


# --- ref :641-705 between/in ---------------------------------------------


def test_between_in(engine):
    out = engine.query_pandas(
        "select temp from forest_fires where temp between 10 and 25 "
        "and day in ('fri', 'sun') and X not in (5, 9)"
    )
    m = (
        FOREST["temp"].between(10, 25)
        & FOREST["day"].isin(["fri", "sun"])
        & ~FOREST["X"].isin([5, 9])
    )
    eq(out, FOREST.loc[m, ["temp"]])


# --- ref :708-769 case ----------------------------------------------------


def test_case_when(engine):
    out = engine.query_pandas(
        "select case when wind > 5 then 'strong' when wind = 5 then 'mid' "
        "else 'weak' end as strength from forest_fires"
    )
    oracle = pd.DataFrame(
        {
            "strength": np.where(
                FOREST["wind"] > 5, "strong", np.where(FOREST["wind"] == 5, "mid", "weak")
            )
        }
    )
    eq(out, oracle)


# --- ref :529-638 set ops -------------------------------------------------


def test_union_dedups(engine):
    out = engine.query_pandas(
        "select month from forest_fires where temp > 25 "
        "union select month from forest_fires where rain != 0"
    )
    a = FOREST.loc[FOREST["temp"] > 25, ["month"]]
    b = FOREST.loc[FOREST["rain"] != 0, ["month"]]
    eq(out, pd.concat([a, b]).drop_duplicates())


def test_union_all_keeps_dups(engine):
    out = engine.query_pandas(
        "select month from forest_fires where temp > 25 "
        "union all select month from forest_fires where rain != 0"
    )
    a = FOREST.loc[FOREST["temp"] > 25, ["month"]]
    b = FOREST.loc[FOREST["rain"] != 0, ["month"]]
    eq(out, pd.concat([a, b]))


# --- ref :772-967 windows (xfail there, native here) ----------------------


def test_rank_over_order(engine):
    out = engine.query_pandas(
        "select wind, rank() over (order by wind) as r from forest_fires"
    )
    oracle = pd.DataFrame(
        {"wind": FOREST["wind"], "r": FOREST["wind"].rank(method="min").astype("int64")}
    )
    eq(out, oracle)


def test_dense_rank_partition(engine):
    out = engine.query_pandas(
        "select day, wind, dense_rank() over (partition by day order by wind desc) as r "
        "from forest_fires"
    )
    oracle = pd.DataFrame(
        {
            "day": FOREST["day"],
            "wind": FOREST["wind"],
            "r": FOREST.groupby("day")["wind"]
            .rank(method="dense", ascending=False)
            .astype("int64"),
        }
    )
    eq(out, oracle)
