"""PII detection/redaction (analytics/pii.py)."""

from pyspark.sql import functions as F

from persistor_spark.analytics import pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return pii.with_pii(df).collect()[0]


def test_email_detection_and_redaction(spark):
    r = _one(spark, "write to alice.smith+tag@sub.example.co today")
    assert r["n_emails"] == 1 and r["has_pii"] is True
    assert "[EMAIL]" in r["redacted"] and "alice" not in r["redacted"]


def test_phone_and_ip(spark):
    r = _one(spark, "call 555-123-4567 or ping 192.168.0.12 now")
    assert r["n_phones"] == 1 and r["n_ips"] == 1
    assert "[PHONE]" in r["redacted"] and "[IP]" in r["redacted"]
    assert "555-123-4567" not in r["redacted"]


def test_clean_text_untouched(spark):
    r = _one(spark, "no sensitive data here just words")
    assert r["has_pii"] is False
    assert r["redacted"] == "no sensitive data here just words"


def test_multiple_matches_counted(spark):
    r = _one(spark, "a@b.com c@d.org 10.0.0.1 10.0.0.2 10.0.0.3")
    assert r["n_emails"] == 2 and r["n_ips"] == 3


def test_redaction_preserves_surroundings(spark):
    r = _one(spark, "before a@b.io after")
    assert r["redacted"] == "before [EMAIL] after"


def test_filter_pushdown_stays_jvm(spark):
    # the detector must compile to JVM expressions: no BatchEvalPython in plan
    df = spark.createDataFrame([("x@y.zz",), ("clean",)], "text string")
    plan = pii.with_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
