"""Link discovery: href resolution + URL parsing as NATIVE column
expressions (SURVEY.md §2 ops 05/06/43).

Resolution runs JVM-side (whole-stage codegen) because at 10^10-URL
scale the exploded link table is the biggest intermediate in a round;
only canonicalization crosses into a pandas UDF. The pure-Python
mirror of this exact logic is functions/canonicalize.resolve_href and
tests assert both agree on every generated link.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_ROOT_RE = r"^(https?://[^/?#]+)"
_BASEDIR_RE = r"^(https?://.*/)[^/]*$"


def resolve_href_col(base: Column, href: Column) -> Column:
    """Absolute URL for ``href`` found on page ``base`` (native exprs)."""
    root = F.regexp_extract(base, _ROOT_RE, 1)
    basedir = F.regexp_extract(base, _BASEDIR_RE, 1)
    prefix = F.when(basedir != "", basedir).otherwise(F.concat(root, F.lit("/")))
    return (
        F.when(href.startswith("http://") | href.startswith("https://"), href)
        .when(root == "", href)
        .when(href.startswith("/"), F.concat(root, href))
        .otherwise(F.concat(prefix, href))
    )


def host_col(url: Column) -> Column:
    """host[:port] of a canonical URL — same regex as host_of_series."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://([^/?#]*)", 1)


def path_col(url: Column) -> Column:
    """path ('/' if empty) of a canonical URL — mirror of path_of_series."""
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def is_http_col(url: Column) -> Column:
    return url.startswith("http://") | url.startswith("https://")


def url_struct_col(url: Column) -> Column:
    """op 06: url -> struct(scheme, host, path, query)."""
    return F.struct(
        F.regexp_extract(url, r"^([a-z][a-z0-9+.\-]*)://", 1).alias("scheme"),
        host_col(url).alias("host"),
        path_col(url).alias("path"),
        F.regexp_extract(url, r"\?([^#]*)", 1).alias("query"),
    )
