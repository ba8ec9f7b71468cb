"""Property-based tests for the cleaning-expression parity (SURVEY §7.4
risks 3, 8, 9): hypothesis-generated inputs run through the Catalyst
expressions in one batch and are checked against an independent Python
re-implementation of the reference semantics
(`csv_bronze_to_silver.py:83-149`, `social_bronze_to_silver.py:82-129`).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from e_commerce_data_lakehouse_spark.functions import text as tx

# -- independent Python models of the reference semantics -------------------


# Java \s == ASCII whitespace [ \t\n\x0b\f\r]; Python str.strip() with an
# explicit set mirrors it (plain .strip() would also eat unicode whitespace,
# which Java's default \s does not match)
_WS = " \t\n\x0b\f\r"


def py_clean_city(s: str | None) -> str | None:
    if s is None:
        return None
    m = re.search(r'"city"\s*:\s*"([^"]+)"', s)
    if not m or not m.group(1).strip(_WS):
        return None
    return m.group(1).strip(_WS)


def py_clean_content(s: str | None) -> str | None:
    if s is None:
        return None
    out = re.sub(r"[\x00-\x1f\x7f-\x9f]", " ", s)
    out = re.sub(r"[ \t\n\x0b\f\r]+", " ", out).strip(_WS)
    return out or None


def py_parse_bool(s: str | None) -> bool | None:
    # P6 is SQL CASE with TRIM (spaces only), not a Python UDF
    if s is None:
        return None
    return s.strip(" ").lower() in ("true", "1", "yes", "t")


def _run(spark, values, col_expr):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["out"] for r in df.select(col_expr(F.col("x")).alias("out")).collect()]


# One batched Spark job per property (hypothesis drives the value list, the
# DataFrame evaluates all examples at once — per-example jobs would be
# hopelessly slow).

city_texts = st.one_of(
    st.none(),
    st.text(max_size=40),
    st.builds(
        lambda pre, city, post: f'{pre}"city": "{city}"{post}',
        st.text(max_size=10),
        st.text(
            alphabet=st.characters(blacklist_characters='"', blacklist_categories=("Cs",)),
            max_size=15,
        ),
        st.text(max_size=10),
    ),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(city_texts, min_size=1, max_size=50))
def test_clean_city_matches_reference_model(spark, values):
    got = _run(spark, values, tx.clean_city)
    assert got == [py_clean_city(v) for v in values]


content_texts = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
    ),
    # Arabic / RTL content must survive cleaning (risk 8)
    st.text(alphabet="ابتثجحخدذرزسشصضطظعغفقكلمنهوي \t\x00\x1f", max_size=40),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(content_texts, min_size=1, max_size=50))
def test_clean_content_matches_reference_model(spark, values):
    got = _run(spark, values, tx.clean_content)
    assert got == [py_clean_content(v) for v in values]


bool_texts = st.one_of(
    st.none(),
    st.sampled_from(["true", "TRUE", " t ", "1", "yes", "YES", "false", "0", "junk", ""]),
    st.text(max_size=8),
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(bool_texts, min_size=1, max_size=50))
def test_parse_bool_matches_reference_model(spark, values):
    got = _run(spark, values, tx.parse_bool)
    assert got == [py_parse_bool(v) for v in values]


def test_arabic_text_preserved_exactly(spark):
    s = "\x00  مرحبا  بالعالم \x1f"
    out = _run(spark, [s], tx.clean_content)[0]
    assert out == "مرحبا بالعالم"


def test_map_type_roundtrip(spark, tmp_path):
    """Risk 9: MapType metadata column survives a parquet round trip."""
    df = spark.createDataFrame(
        [(1, {"camera": "x100", "w": "640"}), (2, {})],
        "id int, metadata map<string,string>",
    )
    p = str(tmp_path / "m")
    df.write.parquet(p)
    back = spark.read.parquet(p).orderBy("id").collect()
    assert back[0]["metadata"] == {"camera": "x100", "w": "640"}
    assert back[1]["metadata"] == {}
