"""Deterministic synthetic Common-Crawl-style web-pages table.

Shape mandated by the driver (BASELINE.json input_hint / FIXTURES.md §C):

    pages: (url: string, warc_ts: timestamp, html: binary,
            text: string, lang: string)

Generation is **fully distributed**: every column is a pure deterministic
function of the row id (``spark.range`` + xxhash64-derived pseudo-randoms),
so the same code scales from 10k rows in tests to 10^12 rows on a cluster
with zero driver-side data and no Python in the row path.

Deliberate skew + gaps (FIXTURES.md §C):
- hosts follow a log-uniform (Zipf-like, s≈1) distribution — host 0 is the
  "hot host" that exercises salting/AQE;
- ~20% of (host, hour) cells are dropped so 1h-tier gap-fill has work;
- langs are en-heavy weighted;
- text length varies per page (drives the text-size measure); html wraps the
  text in bytes so byte-identity (sha2) can be verified end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = (
    "data", "crawl", "web", "page", "series", "spark", "rollup", "index",
    "query", "batch", "stream", "tier", "host", "text", "time", "value",
)


def _u(col, salt: int, seed: int):
    """Deterministic uniform [0,1) from a column + salt (xxhash64-based)."""
    h = F.xxhash64(col, F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_000)).cast("double")) / 1_000_000_000.0


def synthesize_pages(
    spark: SparkSession,
    n_pages: int = 200_000,
    n_hosts: int = 200,
    start: str = "2024-01-01 00:00:00",
    weeks: int = 8,
    seed: int = 42,
    gap_fraction: float = 0.2,
    partitions: int | None = None,
) -> DataFrame:
    """Build the pages DataFrame; deterministic for (n_pages, …, seed)."""
    total_hours = weeks * 7 * 24
    base = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")

    # Zipf-like host: log-uniform over [1, n_hosts] => P(host=h) ~ 1/h
    u_host = _u(rid, 1, seed)
    host_idx = F.least(
        F.lit(n_hosts - 1),
        F.floor(F.pow(F.lit(float(n_hosts)), u_host)) - 1,
    ).cast("int")

    # en-heavy language mix
    u_lang = _u(rid, 2, seed)
    lang = (
        F.when(u_lang < 0.50, "en")
        .when(u_lang < 0.65, "de")
        .when(u_lang < 0.77, "fr")
        .when(u_lang < 0.90, "es")
        .otherwise("zh")
    )

    # hour slot within the span + in-hour jitter; ~gap_fraction of
    # (host, hour) cells removed deterministically to create gaps
    hour_slot = F.pmod(F.xxhash64(rid, F.lit(3), F.lit(seed)), F.lit(total_hours))
    minute = F.pmod(F.xxhash64(rid, F.lit(4), F.lit(seed)), F.lit(3600))
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start)) + hour_slot * 3600 + minute
    )
    cell_u = _u(F.concat(host_idx.cast("string"), F.lit(":"), hour_slot.cast("string")), 5, seed)

    # deterministic pseudo-text: word picked by hash, repeated 8..~520 times
    word = F.element_at(
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.pmod(F.xxhash64(rid, F.lit(6), F.lit(seed)), F.lit(len(_WORDS))) + 1).cast("int"),
    )
    n_rep = (F.pmod(F.xxhash64(rid, F.lit(7), F.lit(seed)), F.lit(512)) + 8).cast("int")
    text = F.concat(
        F.lit("p"), rid.cast("string"), F.lit(" "),
        F.repeat(F.concat(word, F.lit(" ")), n_rep),
    )

    df = (
        base.select(
            F.concat(
                F.lit("https://host"), host_idx.cast("string"),
                F.lit(".example.com/p/"), rid.cast("string"),
            ).alias("url"),
            warc_ts.alias("warc_ts"),
            text.alias("text"),
            lang.alias("lang"),
        )
        .withColumn("html", F.encode(F.concat(F.lit("<html>"), F.col("text"), F.lit("</html>")), "UTF-8"))
        .filter(F.lit(True) if gap_fraction <= 0 else (cell_u >= gap_fraction))
        .select("url", "warc_ts", "html", "text", "lang")
    )
    return df


def host_of(url_col) -> F.Column:
    """Extract the url host — the series-key half (lang, host).

    Spark's ``parse_url(url, 'HOST')`` is JVM-side and codegen-friendly.
    """
    return F.parse_url(url_col, F.lit("HOST"))
