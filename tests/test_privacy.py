"""PII detect/scrub operator tests (functions/privacy.py).

The corpus is synthetic, so the PII being found is deterministically
injected by ``with_synthetic_pii``; these tests pin the mask ordering
contract (emails before bare digit runs) and the count/scrub agreement
on hand-built rows, independent of the DuckDB parity gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from dygiepp_spark.functions import privacy as PII


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_scrub_masks_all_three_kinds(spark):
    rows = [(1, "mail a.b+c@ex-ample.org then +1 555-0001 and id 123456789 end")]
    out = PII.scrub_pii(_df(spark, rows)).collect()[0]
    assert (out.n_emails, out.n_phones, out.n_longnums) == (1, 1, 1)
    assert out.clean_text == "mail <EMAIL> then <PHONE> and id <NUM> end"


def test_email_scrubbed_before_digit_run_is_eaten(spark):
    # the local part contains a 9-digit run; the email pass must consume
    # it whole so the number pass never sees a half-eaten remnant
    rows = [(7, "reach 123456789x@host.io ok")]
    out = PII.scrub_pii(_df(spark, rows)).collect()[0]
    assert out.clean_text == "reach <EMAIL> ok"
    assert out.n_longnums == 1  # counted over the ORIGINAL text


def test_short_digit_runs_survive(spark):
    rows = [(2, "call 555-0001 or 12345678 fine")]
    out = PII.scrub_pii(_df(spark, rows)).collect()[0]
    assert out.n_phones == 0  # no +CC prefix -> not the phone shape
    assert out.n_longnums == 0  # 8 digits < 9
    assert out.clean_text == "call 555-0001 or 12345678 fine"


def test_synthetic_injection_is_deterministic_and_scrubbable(spark):
    df = _df(spark, [(42, "hello"), (9999, "world")])
    aug = PII.with_synthetic_pii(df)
    a1 = {r.doc_id: r.text for r in aug.collect()}
    a2 = {r.doc_id: r.text for r in PII.with_synthetic_pii(df).collect()}
    assert a1 == a2
    assert "user42@example.com" in a1[42]
    assert "+1 555-0042" in a1[42]
    assert "+1 555-9999" in a1[9999]
    out = {r.doc_id: r for r in PII.scrub_pii(aug).collect()}
    for did in (42, 9999):
        r = out[did]
        assert (r.n_emails, r.n_phones, r.n_longnums) == (1, 1, 1)
        assert "<EMAIL>" in r.clean_text
        assert "<PHONE>" in r.clean_text
        assert "<NUM>" in r.clean_text
        assert "@" not in r.clean_text


def test_scrub_plan_is_single_stage(spark):
    """The detect+scrub projection must stay one codegen'd scan: no
    exchange, no Python evaluation in the plan."""
    df = _df(spark, [(1, "x")])
    plan = PII.scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
