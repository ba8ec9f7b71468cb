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


# Python str.strip()/re-\s whitespace — the engine matches it with
# (?U)[\s\x1c-\x1f] in Java regex (Unicode White_Space + FS..US)
_WS = " \t\n\x0b\f\r"


def _py_clean_field(s: str | None, field: str, max_len: int) -> str | None:
    """VERBATIM re-implementation of the reference's clean_city_udf /
    clean_region_udf (csv_bronze_to_silver.py:83-149), parameterized only
    by the field name and the fallback length bound (50 city / 100 region).
    This is the ground-truth model the Catalyst chain must reproduce."""
    if not s:
        return None
    try:
        patterns = [
            rf'"{field}":\s*"([^"]+)"',
            rf'\\{field}\\":\s*\\"([^\\]+)\\"',
            rf'{field}.*?:\s*["\']([^"\']+)["\']',
        ]
        for pattern in patterns:
            m = re.search(pattern, s, re.IGNORECASE)
            if m:
                val = m.group(1)
                val = (
                    val.encode().decode("unicode_escape")
                    if "\\u" in val
                    else val
                )
                return val.strip()
        clean_text = re.sub(r'[{}"\\\']', "", s)
        clean_text = re.sub(
            rf"{field}\s*:", "", clean_text, flags=re.IGNORECASE
        )
        clean_text = clean_text.strip()
        if 0 < len(clean_text) < max_len:
            return clean_text
        return None
    except Exception:  # noqa: BLE001
        return None


def py_clean_city(s: str | None) -> str | None:
    return _py_clean_field(s, "city", 50)


def py_clean_region(s: str | None) -> str | None:
    return _py_clean_field(s, "region", 100)


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

def _field_texts(field: str):
    # exercises every reference branch: pattern 1 (strict), pattern 2
    # (escaped-JSON), pattern 3 (spaces before colon / single quotes),
    # \uXXXX escapes (incl. a malformed one -> exception branch), and the
    # strip-braces fallback (short garbage, long garbage, `field:` noise)
    inner = st.text(
        alphabet=st.characters(blacklist_characters='"', blacklist_categories=("Cs",)),
        max_size=15,
    )
    return st.one_of(
        st.none(),
        st.just(""),
        st.text(max_size=40),
        st.text(max_size=80),
        st.builds(
            lambda pre, v, post: f'{pre}"{field}": "{v}"{post}',
            st.text(max_size=10),
            inner,
            st.text(max_size=10),
        ),
        st.builds(lambda v: f'{{"{field}" :  "{v}", "x": "1"}}', inner),
        st.builds(
            lambda v: f'\\"{field}\\": \\"{v}\\"',
            st.text(
                alphabet=st.characters(
                    blacklist_characters='"\\', blacklist_categories=("Cs",)
                ),
                max_size=12,
            ),
        ),
        st.builds(lambda v: f"{{'{field}': '{v}'}}", inner),
        st.just(f'{{"{field}": "Montr\\u00e9al"}}'),
        st.just(f'{{"{field}": "bad\\uZZZZ"}}'),
        st.just(f'{{"{field}": "  \\t  "}}'),
        st.builds(lambda v: f"{field}: {v}", st.text(max_size=60)),
    )


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_field_texts("city"), min_size=1, max_size=50))
def test_clean_city_matches_reference_model(spark, values):
    got = _run(spark, values, tx.clean_city)
    assert got == [py_clean_city(v) for v in values]


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_field_texts("region"), min_size=1, max_size=50))
def test_clean_region_matches_reference_model(spark, values):
    got = _run(spark, values, tx.clean_region)
    assert got == [py_clean_region(v) for v in values]


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


def test_strip_html_known_answers(spark):
    """Scripts/styles vanish with their CONTENT, tags strip, entities
    decode, whitespace collapses."""
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.functions.text import strip_html

    rows = [
        (1, "<p>hello <b>world</b></p>"),
        (2, "<script>var hidden = 'SECRET';</script>visible"),
        (3, "<style>.x{color:red}</style>a &amp; b &lt;tag&gt;"),
        (4, "multi\n\n  line   <br>  text"),
        (5, "<SCRIPT>var UP = 'HIDDEN';</SCRIPT>case"),
        (6, "nested: &amp;lt; stays escaped"),
        (7, "<Style>.mixed{}</Style>x<P>para</P><DIV>d</DIV>"),
    ]
    df = spark.createDataFrame(rows, ["i", "h"])
    got = {
        r["i"]: r["s"]
        for r in df.select("i", strip_html(F.col("h")).alias("s")).collect()
    }
    assert got[1] == "hello world"
    assert got[2] == "visible" and "SECRET" not in got[2]
    assert got[3] == 'a & b <tag>'
    assert got[4] == "multi line text"
    # HTML tag names are case-insensitive: <SCRIPT>/<Style> blocks drop
    # their CONTENT exactly like lowercase ((?i) is in the Java∩RE2 subset)
    assert got[5] == "case" and "HIDDEN" not in got[5]
    assert got[7] == "x para d"
    # &amp; decodes LAST: '&amp;lt;' is the ESCAPED text '&lt;', not '<'
    assert got[6] == "nested: &lt; stays escaped"


def test_canonical_url_rules(spark):
    """Each canonicalization rule, plus their composition."""
    from pyspark.sql import functions as F

    from e_commerce_data_lakehouse_spark.functions.text import (
        canonical_url,
        url_host,
    )

    rows = [
        (1, "HTTP://WWW.Example.COM:80/A//B///c/#frag"),
        (2, "https://host.example:443/x/?q=1"),
        (3, "http://Host.Example/"),
        (4, "https://h.example:8443/keep:443/port"),
        (5, "http://h.example/CaseKept/Path"),
        # query strings are NOT paths: slashes inside query values must
        # survive byte-identically (no collapse, no trailing-slash strip)
        (6, "http://h.example/a//b/?next=/x//y/"),
        (7, "https://h.example:443?q=1"),
        (8, "http://h.example/p?a=1/"),
    ]
    df = spark.createDataFrame(rows, ["i", "u"])
    got = {
        r["i"]: (r["c"], r["h"])
        for r in df.select(
            "i",
            canonical_url(F.col("u")).alias("c"),
            url_host(canonical_url(F.col("u"))).alias("h"),
        ).collect()
    }
    assert got[1] == ("http://www.example.com/A/B/c", "www.example.com")
    assert got[2] == ("https://host.example/x?q=1", "host.example")
    assert got[3] == ("http://host.example", "host.example")
    # non-default port survives; :443 inside the path untouched
    assert got[4] == ("https://h.example:8443/keep:443/port", "h.example")
    # path case is preserved (only scheme/authority fold)
    assert got[5] == ("http://h.example/CaseKept/Path", "h.example")
    # path rules stop at the first '?': query content is untouched
    assert got[6] == ("http://h.example/a/b?next=/x//y/", "h.example")
    # default port drops even when the query starts right after it
    assert got[7] == ("https://h.example?q=1", "h.example")
    # a query value ending in '/' keeps it (no trailing-slash strip)
    assert got[8] == ("http://h.example/p?a=1/", "h.example")


# ---------------------------------------------------------------------------
# r9 exact-arithmetic properties (defect class #7: ROUND(double) is not
# engine-portable at ulp boundaries — quality/dsir now round in BIGINT)
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4_000_000_000_000),
            st.integers(min_value=1, max_value=2_000_000_000),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_idiv_half_up_matches_python_exact(spark, pairs):
    """idiv / idiv_half_up must equal Python's exact integer arithmetic
    for every (num, den) inside the documented 2^53 bound."""
    from e_commerce_data_lakehouse_spark.functions.exact import (
        idiv,
        idiv_half_up,
    )

    df = spark.createDataFrame(pairs, ["n", "d"])
    got = (
        df.select(
            "n",
            "d",
            idiv(F.col("n"), F.col("d")).alias("q"),
            idiv_half_up(F.col("n"), F.col("d")).alias("h"),
        )
        .collect()
    )
    for r in got:
        assert r["q"] == r["n"] // r["d"], (r["n"], r["d"])
        assert r["h"] == (2 * r["n"] + r["d"]) // (2 * r["d"]), (
            r["n"],
            r["d"],
        )


@given(
    st.lists(
        st.text(
            alphabet="ab the of.!?  ",  # letters, stopword chars, punct, ws
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_quality_score_matches_exact_rational_model(spark, texts):
    """quality_score must equal the exact-Fraction reference model —
    including half-up ties, the boundary case the gen-sf1 oracle gate
    caught (Spark 0.833437 vs DuckDB 0.833438 under the old
    ROUND(double) form)."""
    from fractions import Fraction

    STOP = set(tx.STOPWORDS)

    def model(text):
        t = text[:2000]
        L = min(len(t), 500)
        nonspace = re.sub(r"\s", "", t)
        P = max(len(nonspace), 1)
        p = len(re.sub(r"[A-Za-z0-9\s]", "", t))
        toks = re.split(r"\s+", t.lower().strip())
        T = len(toks)
        s = sum(1 for x in toks if x in STOP)
        q = Fraction(L * (P - p) * (2 * T - s) * 10**6, 500 * P * 2 * T)
        num, den = q.numerator, q.denominator
        return ((2 * num + den) // (2 * den)) / 1e6  # half-up micros

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {
        r["i"]: r["q"]
        for r in df.select(
            "i", tx.quality_score(F.col("t")).alias("q")
        ).collect()
    }
    for i, t in rows:
        assert got[i] == model(t), (t, got[i], model(t))
