"""Hostile-payload differential fuzz for the ``events_json_invalid``
dynamic-JSON query (nine VARIANT keyword arms) against its DuckDB oracle.

The sf0.01 fixture's ``props`` column is uniformly ``{"k": <int>}`` and
``event_type`` is a five-word enum — the oracle has never been exercised
on malformed JSON, non-integer ``k`` shapes, boundary digit counts,
quote/backslash ``event_type`` values, or extreme ``value`` doubles.
Every prior fuzz reseed found real bugs; this lane points the same
technique at the VARIANT arms (VERDICT r4 next #6 follow-through).

Corpus contract (documented limits of the oracle twin, not the engine):

- ``event_type`` stays free of combining marks / jamo / ZWJ because the
  oracle approximates the tuple arm's legacy-grapheme ``maxLength`` with
  DuckDB ``length()`` (exact for ASCII/CJK/single-codepoint emoji, the
  fixture's domain).
- Duplicate-key ``props`` documents are excluded per the query's
  documented single-key contract (__spark_entry__._build_events_json_invalid).
"""

import math
import random

import duckdb
import pytest

import __spark_entry__ as entry_mod

SEED = 20261008

_FIXED_PROPS = [
    None, "", "null", "42", "[1, 2]", "not json", "{}", "{'k': 7}",
    '{"x": 1}', '{"k": null}', '{"k": true}', '{"k": false}',
    '{"k": "12"}', '{"k": "abc"}', '{"k": ""}',
    '{"k": 7}', '{"k": -7}', '{"k": 0}', '{"k": -0}',
    '{"k": 4.5}', '{"k": -4.5}', '{"k": 1e2}', '{"k": 1E2}',
    '{"k": 0.0}', '{"k": 7.0}',
    '{"k": 99999999999999}',        # 14 digits: last armed width
    '{"k": 999999999999999}',       # 15 digits: rlike gate must reject
    '{"k": -99999999999999}',
    '{"k": 42}', '{"k": 14}', '{"k": 21}', '{"k": 50}', '{"k": 51}',
    '{"k": [1]}', '{"k": {"a": 1}}',
    '  {"k": 7}  ', '{"K": 7}', '{ "k" : 7 }',
    '{"k": 7, "other": "x\\"y"}',
    '{"k": 007}',                   # leading zero: invalid JSON literal
    '{"k": +7}',                    # plus sign: invalid JSON literal
]

_FIXED_TYPES = [
    None, "", "a", "click", "abcde", "abcdef", 'with"quote',
    "back\\slash", "五字中文字符五", "中文", "\U0001f600" * 5,
    "\U0001f600" * 6, "click ", " click", "a.b,c", "x" * 300,
]

_FIXED_VALUES = [
    None, 0.0, -0.0, 0.25, -0.25, 0.1, 1.0, 42.0, 0.75, 100.5,
    1e19, 1e308, -1e-308, 5e-324, 123456.789, -0.125,
    float("nan"), float("inf"), float("-inf"),
]


def _corpus():
    rng = random.Random(SEED)
    rows = []
    i = 0

    def add(props, etype, value):
        nonlocal i
        rows.append((i, None, i % 7, etype, value, props))
        i += 1

    for p in _FIXED_PROPS:
        add(p, "click", 10.5)
    for t in _FIXED_TYPES:
        add('{"k": 14}', t, 2.0)
    for v in _FIXED_VALUES:
        add('{"k": 14}', "click", v)
    for _ in range(250):
        roll = rng.random()
        if roll < 0.7:
            k = rng.choice([
                str(rng.randint(-100, 100)),
                str(rng.randint(-10 ** 15, 10 ** 15)),
                f"{rng.uniform(-60, 60):.2f}",
                '"%d"' % rng.randint(0, 9), "null", "true",
            ])
            props = '{"k": %s}' % k
        elif roll < 0.85:
            props = rng.choice(_FIXED_PROPS)
        else:
            props = "".join(rng.choice('{}[]":,k0 7') for _ in range(
                rng.randint(0, 12)))
        etype = rng.choice(_FIXED_TYPES + ["signup", "error", "view"])
        value = rng.choice(_FIXED_VALUES + [
            round(rng.uniform(-1000, 1000), rng.randint(0, 6))])
        add(props, etype, value)
    return rows


@pytest.fixture(scope="module")
def hostile_events_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hostile_events"))
    df = spark.createDataFrame(
        _corpus(),
        schema="event_id long, ts timestamp, user_id long, "
               "event_type string, value double, props string")
    df.repartition(4).write.mode("overwrite").parquet(
        f"{d}/events.parquet")
    return d


def test_events_json_arms_match_duckdb_on_hostile_corpus(
        spark, hostile_events_sf):
    q = entry_mod.queries()["events_json_invalid"]
    sql = entry_mod.oracle_sql()["events_json_invalid"]
    sdf = q(spark, hostile_events_sf)
    cols = sorted(sdf.columns)
    got = [tuple(r[c] for c in cols) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"'{hostile_events_sf}/events.parquet/*.parquet'")
    ora = con.execute(
        f"select {', '.join(cols)} from ({sql})").fetchall()
    assert got == ora, (
        f"columns={cols}\nspark ={got}\noracle={ora}")
