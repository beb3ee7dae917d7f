"""Local mirror of the driver's correctness gate: run every QUERIES entry on
Spark and its oracle SQL on DuckDB over the same parquet, compare row count,
column names, and order-insensitive values (sf0.001 for speed; the driver
runs sf0.01)."""

import os

import duckdb
import pytest

from spark_ml_spatialjointransformer_spark.queries import QUERIES

SF_DIR = os.environ.get("SJT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_result(sql):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # arrow schema of the same query (LIMIT 0 — types are static) so tests
    # can pin physical type parity, not just value parity: the driver's
    # value hash is representation-sensitive (r5: five oracles failed only
    # because an uncast DuckDB sum() surfaced as decimal128 vs Spark int64)
    arrow_schema = con.execute(
        f"SELECT * FROM ({sql.strip().rstrip(';')}) LIMIT 0"
    ).arrow().schema
    return cols, rows, arrow_schema


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple(map(str, t)))
    return sorted(cols), out


ORACLE_QUERIES = [k for k, v in QUERIES.items() if v.oracle]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    qd = QUERIES[name]
    df = qd.fn(spark, SF_DIR)

    # the driver hashes values: keep oracle-checked outputs free of raw
    # doubles (scaled ints instead) so libm ulp noise can't flip the hash
    for f in df.schema.fields:
        assert f.dataType.simpleString() not in ("double", "float"), (
            f"{name}: column {f.name} is floating-point — use scaled-int output"
        )

    s_cols, s_rows = normalize(df.columns, [tuple(r) for r in df.collect()])
    d_cols_raw, d_rows_raw, d_arrow = duck_result(qd.oracle)
    d_cols, d_rows = normalize(d_cols_raw, d_rows_raw)

    # physical-type parity: the DuckDB side must not produce a wider/other
    # representation than the Spark schema for the same column (decimal128
    # from an uncast sum() is the classic failure — CAST(... AS BIGINT) in
    # the oracle).  Width classes only; nested/temporal types are exempt
    # beyond the decimal ban.
    spark_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    allowed = {
        "bigint": {"int64"},
        "int": {"int32"},
        "smallint": {"int16"},
        "boolean": {"bool"},
        "string": {"string", "large_string"},
    }
    for field in d_arrow:
        a_type = str(field.type)
        assert "decimal" not in a_type, (
            f"{name}: oracle column {field.name} is {a_type} — wrap the "
            f"aggregate in CAST(... AS BIGINT) so the driver hash matches"
        )
        s_type = spark_types.get(field.name)
        if s_type in allowed:
            assert a_type in allowed[s_type], (
                f"{name}: oracle column {field.name} is arrow {a_type} but "
                f"Spark emits {s_type} — driver value-hash will mismatch"
            )

    assert s_cols == d_cols, f"{name}: column sets differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row counts differ spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    assert s_rows == d_rows, f"{name}: values differ"
    assert len(s_rows) > 0, f"{name}: empty result proves nothing"
