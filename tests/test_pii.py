"""PII detection/redaction tests (extensions/pii.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.extensions.pii import (
    PII_KINDS,
    PII_PATTERNS,
    luhn_valid,
    pii_stats,
    redact_pii,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


class TestDetection:
    def test_each_kind_detected(self, spark):
        samples = {
            "email": "write to jane.doe+tag@sub.example.co.uk today",
            "cc16": "card 4111 1111 1111 1111 on file",
            "ssn": "ssn is 078-05-1120 ok",
            "phone": "call +44-171-555-0123 now",
            "ipv4": "host at 192.168.0.254 responded",
        }
        df = _df(spark, list(samples.values()))
        rows = {r.doc_id: r for r in pii_stats(df).collect()}
        for ix, kind in enumerate(samples):
            r = rows[ix]
            assert getattr(r, f"n_{kind}") == 1, kind
            assert r.n_pii == 1, kind

    def test_clean_text_zero(self, spark):
        df = _df(spark, ["no pii here 1234 5678 end", ""])
        for r in pii_stats(df).collect():
            assert r.n_pii == 0

    def test_multiple_hits_counted(self, spark):
        df = _df(spark, ["a@b.io c@d.io e@f.io"])
        assert pii_stats(df).collect()[0].n_email == 3

    def test_kind_subset(self, spark):
        df = _df(spark, ["a@b.io at 10.0.0.1"])
        out = pii_stats(df, kinds=("email",)).collect()[0]
        assert out.n_email == 1 and out.n_pii == 1
        assert not hasattr(out, "n_ipv4")


class TestRedaction:
    def test_typed_placeholders(self, spark):
        df = _df(spark, [
            "mail a@b.org card 4111-1111-1111-1111 ip 10.0.0.1 "
            "ssn 078-05-1120 tel +1-202-555-0199 done"
        ])
        red = redact_pii(df).collect()[0].redacted
        for kind in PII_KINDS:
            assert f"[{kind.upper()}]" in red, kind
        assert "a@b.org" not in red
        assert "4111" not in red
        assert "078-05-1120" not in red
        assert "555-0199" not in red
        assert "10.0.0.1" not in red
        assert red.endswith("done")

    def test_clean_text_untouched(self, spark):
        txt = "plain sentence with numbers 12 34 and words."
        df = _df(spark, [txt])
        assert redact_pii(df).collect()[0].redacted == txt

    def test_ssn_not_eaten_by_phone(self, spark):
        # 3-2-4 must redact as SSN, not phone (phone needs 3-3-4)
        df = _df(spark, ["id 078-05-1120 and tel 202-555-0199 x"])
        red = redact_pii(df).collect()[0].redacted
        assert "[SSN]" in red and "[PHONE]" in red


class TestLuhn:
    def _ref(self, digits: str) -> bool:
        total = 0
        for r, ch in enumerate(reversed(digits)):
            d = int(ch)
            if r % 2 == 1:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    def test_known_cards(self, spark):
        cases = ["4111111111111111", "5500005555555559",
                 "4111111111111112", "79927398713", "1234567812345670"]
        df = spark.createDataFrame([(c,) for c in cases], "d string")
        got = {r.d: r.ok for r in df.select(
            "d", luhn_valid(F.col("d")).alias("ok")).collect()}
        for c in cases:
            assert got[c] == self._ref(c), c

    def test_random_match_reference(self, spark):
        rng = np.random.default_rng(9)
        cases = ["".join(str(d) for d in rng.integers(0, 10, n))
                 for n in rng.integers(8, 20, 40)]
        df = spark.createDataFrame([(c,) for c in cases], "d string")
        got = {r.d: r.ok for r in df.select(
            "d", luhn_valid(F.col("d")).alias("ok")).collect()}
        for c in cases:
            assert got[c] == self._ref(c), c


class TestCrossEngine:
    def test_duckdb_same_counts_and_redaction(self, spark):
        """The oracle contract: identical pattern text must behave
        identically under Java regex (Spark) and RE2 (DuckDB)."""
        import duckdb

        texts = [
            "mail a.b+c@ex-ample.org and 10.0.255.1 tail",
            "cards 4111111111111111 and 4111-1111-1111-1111",
            "tel +1-202-555-0199 or 49.89.555.1234 odd",
            "ssn 078-05-1120, not 0780-05-1120x",
            "no pii",
        ]
        df = _df(spark, texts)
        spark_stats = {
            r.doc_id: r.asDict() for r in pii_stats(df).collect()
        }
        spark_red = {
            r.doc_id: r.redacted for r in redact_pii(df).collect()
        }
        con = duckdb.connect()
        for ix, t in enumerate(texts):
            esc = t.replace("'", "''")
            for k, p in PII_PATTERNS.items():
                n = con.sql(
                    f"SELECT len(regexp_extract_all('{esc}', '{p}'))"
                ).fetchone()[0]
                assert spark_stats[ix][f"n_{k}"] == n, (ix, k)
            expr = f"'{esc}'"
            for k, p in PII_PATTERNS.items():
                expr = (f"regexp_replace({expr}, '{p}', "
                        f"'[{k.upper()}]', 'g')")
            red = con.sql(f"SELECT {expr}").fetchone()[0]
            assert spark_red[ix] == red, ix


class TestPhoneAnchoring:
    def test_digit_run_tail_not_redacted(self, spark):
        # '9999123-456-7890' is not a phone: without the \b after the
        # optional +CC group the 3-3-4 tail inside the longer digit
        # run was matched and partially redacted
        df = spark.createDataFrame(
            [(1, "ref 9999123-456-7890 end"),
             (2, "call 123-456-7890 now"),
             (3, "intl +44 123-456-7890 ok")],
            "doc_id bigint, text string")
        from xcube_resampling_spark.extensions.pii import (
            pii_stats, redact_pii)
        stats = {r["doc_id"]: r["n_phone"]
                 for r in pii_stats(df).collect()}
        assert stats == {1: 0, 2: 1, 3: 1}
        red = {r["doc_id"]: r["redacted"]
               for r in redact_pii(df).collect()}
        assert red[1] == "ref 9999123-456-7890 end"
        assert red[2] == "call [PHONE] now"
        assert red[3] == "intl [PHONE] ok"

    def test_empty_kinds_raises(self, spark):
        from xcube_resampling_spark.extensions.pii import pii_stats
        df = spark.createDataFrame([(1, "x")],
                                   "doc_id bigint, text string")
        with pytest.raises(ValueError, match="at least one"):
            pii_stats(df, kinds=())
