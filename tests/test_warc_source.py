from __future__ import annotations

from anofox_forecast_spark.sources.warc import (
    parse_warc_bytes,
    parse_warc_records,
    synthesize_warc,
)


RECS = [
    {"url": "https://a.com/1", "date": "2026-01-01T00:00:00Z",
     "body": "hello <b>world</b>"},
    {"url": "https://b.com/2", "date": "2026-01-02T00:00:00Z",
     "body": "café \U0001F600"},
    {"url": "https://c.com/meta", "date": "2026-01-03T00:00:00Z",
     "body": b"raw metadata", "http": False, "warc_type": "metadata"},
]


def test_roundtrip_unwraps_http_and_unicode():
    recs = parse_warc_bytes(synthesize_warc(RECS))
    assert len(recs) == 3
    f0, s0, b0 = recs[0]
    assert f0["warc-target-uri"] == "https://a.com/1"
    assert f0["warc-type"] == "response"
    assert s0 == 200 and b0 == b"hello <b>world</b>"
    # content-length is BYTES: the 4-byte emoji must slice correctly
    assert recs[1][2].decode("utf-8") == "café \U0001F600"
    # non-HTTP record: no envelope unwrap, status sentinel
    assert recs[2][0]["warc-type"] == "metadata"
    assert recs[2][1] == -1 and recs[2][2] == b"raw metadata"


def test_malformed_never_poisons():
    good = synthesize_warc(RECS)
    assert len(parse_warc_bytes(good + b"WARC/1.0\r\nbroken")) == 3
    assert len(parse_warc_bytes(good[:40])) == 0
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"not a warc at all") == []
    # bad content-length stops cleanly
    bad = b"WARC/1.0\r\nContent-Length: nope\r\n\r\nxxx"
    assert parse_warc_bytes(bad) == []
    # negative content-length must not walk the cursor backwards (would
    # otherwise loop forever re-finding the same header)
    neg = b"WARC/1.0\r\nContent-Length: -5\r\n\r\nxxx"
    assert parse_warc_bytes(neg) == []


def test_parse_warc_records_dataframe(spark):
    files = spark.createDataFrame(
        [("f1.warc", synthesize_warc(RECS)),
         ("f2.warc", synthesize_warc(RECS[:1])),
         ("f3.warc", None)],
        "path string, content binary",
    )
    out = parse_warc_records(files).collect()
    assert len(out) == 4
    by_key = {(r["path"], r["record_no"]): r for r in out}
    r = by_key[("f1.warc", 1)]
    assert r["url"] == "https://b.com/2" and r["http_status"] == 200
    assert bytes(r["payload"]).decode("utf-8") == "café \U0001F600"
    assert by_key[("f2.warc", 0)]["warc_date"] == "2026-01-01T00:00:00Z"


def test_parse_plan_shuffle_free(spark):
    files = spark.createDataFrame(
        [("f.warc", synthesize_warc(RECS))], "path string, content binary"
    )
    plan = (
        parse_warc_records(files)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
