"""PII redaction — the scrub pass a training-data pipeline runs
before anything ships to a model: replace emails / phone numbers /
IPv4 addresses with typed placeholder tokens and count what was hit
(the counts feed drop-or-keep policies downstream). No reference
counterpart (§2.10 training-data surface).

Pure ``regexp_replace`` / ``regexp_count`` Column expressions —
whole-stage codegen, zero shuffles, scales as a straight map over
the corpus. Patterns are deliberately RE2-safe (no lookaround) so
the same regex runs identically in Spark (Java regex) and DuckDB
(RE2) for the oracle check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# keep in sync with the oracle SQL in __spark_entry__.py
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, redacted, n_emails, n_phones, n_ips) — placeholders
    ``<EMAIL>`` / ``<PHONE>`` / ``<IP>``. Order matters: emails are
    scrubbed before IPs so a dotted domain can't half-match the IPv4
    pattern after partial rewriting.

    Counts are taken STAGE-BY-STAGE on the progressively redacted
    text, so each count equals the number of placeholders actually
    inserted at that stage: counting every pattern on the original
    text reported phantom hits — '555-123-4567@example.com' is ONE
    redacted email, but the original-text phone count also claimed a
    phone that was never scrubbed, and drop-or-keep policies keyed on
    the counts acted on PII that does not survive in `redacted`
    (r9 review finding)."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_phone = F.regexp_replace(after_email, PHONE_RE, "<PHONE>")
    redacted = F.regexp_replace(after_phone, IPV4_RE, "<IP>")
    return df.select(
        id_col,
        redacted.alias("redacted"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(after_phone, F.lit(IPV4_RE)).alias("n_ips"),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: the privacy
    gate a training-data release runs AFTER redaction — direct
    identifiers may be scrubbed, yet a rare COMBINATION of innocuous
    attributes (nation x segment x zip...) still singles a person
    out. One row per observed combo with its group size and a
    ``k_anonymous`` flag; rows with ``group_n < k`` are the
    re-identification risks (suppress or generalize before release).

    Scale shape: one hash aggregation on the quasi-identifier tuple —
    map-side partial combine, output cardinality = #distinct combos
    (bounded by the quasi space, not the data). Also emits
    ``risk_rows``-style downstream filters for free: join this back
    broadcast to tag or drop risky source rows.

    No reference counterpart; §2.10 capability-gap operator next to
    PII redaction.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_n"))
        .withColumn("k_anonymous", F.col("group_n") >= k)
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit: k-anonymity's stronger sibling. A group can
    be large (k-anonymous) yet still leak — if every member shares
    the same SENSITIVE value, membership alone discloses it
    (homogeneity attack, Machanavajjhala et al. '07). One row per
    quasi-identifier combo with the group size, the number of
    DISTINCT sensitive values, and an ``l_diverse`` flag
    (``n_sensitive >= l``).

    Scale shape: one two-level hash aggregation — dedupe
    (quasi, sensitive) tuples map-side, then aggregate per quasi
    combo; output cardinality is the quasi space. NULL sensitive
    values count as one value (a group of all-NULLs is maximally
    homogeneous, not exempt).

    No reference counterpart; §2.10 privacy family next to
    ``k_anonymity_audit``.
    """
    per = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        per.groupBy(*quasi_cols)
        .agg(
            F.sum("_n").alias("group_n"),
            F.count(F.lit(1)).alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            F.col("group_n").cast("bigint").alias("group_n"),
            F.col("n_sensitive").cast("bigint").alias("n_sensitive"),
            (F.col("n_sensitive") >= l).alias("l_diverse"),
        )
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the
    third rung of the privacy ladder. l-diversity can still leak by
    SKEW: a group with l distinct sensitive values whose distribution
    differs wildly from the corpus (99% one disease) discloses plenty.
    A group is t-close when the distance between its sensitive-value
    distribution and the GLOBAL one is ≤ t; for categorical attributes
    under the uniform ground distance the Earth Mover's Distance
    reduces to total variation: ``TVD = ½·Σ_v |p_g(v) − p(v)|``.

    One row per quasi-identifier combo: ``(quasi..., group_n, tvd,
    t_close)``.

    Hash-stable recipe: TVD is computed over EXACT integers —
    ``Σ|n_gv·n − n_v·n_g|`` plus the absent-value remainder
    ``n_g·(n − Σ_{v∈g} n_v)`` (values the group never exhibits still
    contribute |0 − p(v)|; dropping them understates the distance
    exactly when the leak is worst — the chi² full-grid lesson,
    without materializing the grid) — then ONE floor-ratio against
    ``2·n_g·n``. Products stay below 2^63 up to ~3·10⁹ rows; ANSI
    mode throws rather than wraps beyond (the chi² note). NULL
    sensitive values are their own category via the U+001F sentinel
    (the MI recipe); NULL quasi values keep their group because all
    margins are WINDOW sums over the cell table — no equality join
    that would drop NULL keys, and no agg-of-X-joined-to-X lineage.

    Scale: one hash agg onto the (quasi × value) cell table (bounded
    by the domains, not the data), then three window passes and a
    final agg over that bounded table — nothing after the first agg
    scales with corpus size. The global window runs on one task by
    construction, over cell-table rows only (the corpus_mix_report
    bounded-frame precedent).
    """
    from pyspark.sql import Window

    from sparklyclean_spark.functions.rounding import ratio4

    cells = df.groupBy(
        *quasi_cols,
        F.coalesce(F.col(sensitive_col).cast("string"), F.lit("\x1f")).alias(
            "_v"
        ),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_ngv"))
    m = cells.select(
        *quasi_cols,
        "_v",
        "_ngv",
        F.sum("_ngv").over(Window.partitionBy(*quasi_cols)).alias("_ng"),
        F.sum("_ngv").over(Window.partitionBy("_v")).alias("_nv"),
        F.sum("_ngv").over(Window.partitionBy(F.lit(1))).alias("_n"),
    )
    per = m.groupBy(*quasi_cols).agg(
        F.max("_ng").alias("_ng"),
        F.max("_n").alias("_n"),
        F.sum(F.abs(F.col("_ngv") * F.col("_n") - F.col("_nv") * F.col("_ng")))
        .cast("bigint")
        .alias("_s_present"),
        F.sum("_nv").cast("bigint").alias("_nv_present"),
    )
    s = F.col("_s_present") + F.col("_ng") * (F.col("_n") - F.col("_nv_present"))
    tvd = ratio4(s, F.lit(2) * F.col("_ng") * F.col("_n"))
    return per.select(
        *quasi_cols,
        F.col("_ng").cast("bigint").alias("group_n"),
        tvd.alias("tvd"),
        (tvd <= F.lit(t)).alias("t_close"),
    )
