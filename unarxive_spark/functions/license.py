"""License domain: URL-parsing classifier + permissive filter.

Reference analogs:
- fine/coarse license bucketing from the license URL
  (/root/reference/src/utility_scripts/calc_stats.py:56-87)
- permissive-license corpus filter
  (/root/reference/src/utility_scripts/filter_permissively_livensed.py:17-34)

The synthetic schema carries no license column, so the URL is DERIVED
deterministically per document (portable md5 index into the real arXiv
license-URL vocabulary) on BOTH engines — which makes the classifier's
split + nested-when URL parsing itself oracle-checked, not just an
analog over a different attribute.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from unarxive_spark.functions.hashing import h64, h64_sql

# The arXiv license-URL vocabulary (public; index 0 = no license set).
LICENSE_URLS: list[str | None] = [
    None,
    "http://creativecommons.org/licenses/by/4.0/",
    "http://creativecommons.org/licenses/by-sa/4.0/",
    "http://creativecommons.org/licenses/by-nc-sa/4.0/",
    "http://creativecommons.org/licenses/by-nc-nd/4.0/",
    "http://creativecommons.org/publicdomain/zero/1.0/",
    "http://arxiv.org/licenses/nonexclusive-distrib/1.0/",
]

# Coarse buckets that permit redistribution/derivatives (the reference's
# permissive whitelist: CC BY / CC BY-SA / CC0).
PERMISSIVE = ("cc-by", "cc-by-sa", "cc0")

_SALT = "lic|"


def derive_license_url(id_col: Column | str) -> Column:
    """Deterministic license URL per id: portable-hash index into the
    vocabulary (NULL = no license, like unlicensed arXiv papers)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    idx = F.pmod(h64(c.cast("string"), salt=_SALT), F.lit(len(LICENSE_URLS)))
    return F.element_at(
        F.array(*[F.lit(u).cast("string") for u in LICENSE_URLS]),
        (idx + 1).cast("int"),
    )


def license_coarse(url: Column | str) -> Column:
    """Coarse bucket from the URL path — the reference's split + nested
    CASE shape (calc_stats.py:56-87): host decides the family, the path
    segment after /licenses/ the variant."""
    u = F.col(url) if isinstance(url, str) else url
    parts = F.split(u, "/")  # [http:, '', host, seg1, seg2, seg3, '']
    host = F.element_at(parts, 3)
    return (
        F.when(u.isNull(), F.lit("none"))
        .when(
            host == "creativecommons.org",
            F.when(
                F.element_at(parts, 4) == "publicdomain", F.lit("cc0")
            ).otherwise(F.concat(F.lit("cc-"), F.element_at(parts, 5))),
        )
        .when(host == "arxiv.org", F.lit("arxiv-nonexclusive"))
        .otherwise(F.lit("other"))
    )


def license_fine(url: Column | str) -> Column:
    """Fine bucket: coarse + version (e.g. ``cc-by-4.0``)."""
    u = F.col(url) if isinstance(url, str) else url
    parts = F.split(u, "/")
    version = F.element_at(parts, 6)
    return (
        F.when(u.isNull(), F.lit("none"))
        .when(
            F.element_at(parts, 3) == "arxiv.org",
            F.concat(F.lit("arxiv-nonexclusive-"), version),
        )
        .otherwise(F.concat(license_coarse(u), F.lit("-"), version))
    )


def is_permissive(url: Column | str) -> Column:
    """filter_permissively_livensed.py analog: coarse bucket whitelist."""
    return license_coarse(url).isin(*PERMISSIVE)


# ---------------------------------------------------------------------
# DuckDB renderings (oracle side, same logic 1:1)
# ---------------------------------------------------------------------


def derive_license_url_sql(id_expr: str) -> str:
    urls = ", ".join(
        "NULL" if u is None else f"'{u}'" for u in LICENSE_URLS
    )
    idx = f"({h64_sql(f'CAST({id_expr} AS VARCHAR)', salt=_SALT)} % {len(LICENSE_URLS)})"
    return f"list_extract([{urls}], CAST({idx} + 1 AS INT))"


def license_coarse_sql(url_expr: str) -> str:
    parts = f"string_split({url_expr}, '/')"
    return f"""CASE
  WHEN {url_expr} IS NULL THEN 'none'
  WHEN {parts}[3] = 'creativecommons.org' THEN
    CASE WHEN {parts}[4] = 'publicdomain' THEN 'cc0'
         ELSE 'cc-' || {parts}[5] END
  WHEN {parts}[3] = 'arxiv.org' THEN 'arxiv-nonexclusive'
  ELSE 'other' END"""


def license_fine_sql(url_expr: str) -> str:
    parts = f"string_split({url_expr}, '/')"
    return f"""CASE
  WHEN {url_expr} IS NULL THEN 'none'
  WHEN {parts}[3] = 'arxiv.org' THEN 'arxiv-nonexclusive-' || {parts}[6]
  ELSE ({license_coarse_sql(url_expr)}) || '-' || {parts}[6] END"""


def is_permissive_sql(url_expr: str) -> str:
    quoted = ", ".join(f"'{p}'" for p in PERMISSIVE)
    return f"({license_coarse_sql(url_expr)}) IN ({quoted})"
