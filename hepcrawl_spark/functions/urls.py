"""URL canonicalization, host/path parsing, basename extraction.

Reference semantics rebuilt (NOT copied):
- canonicalization role: hepcrawl/loaders.py:162-165 applies
  scrapy's canonicalize_url to every outgoing urls field; the north rule
  requires "canonicalized+murmur3-hashed URLs" for the URL-seen store.
- host key: hepcrawl/utils.py:220-224 (scheme+netloc); here just the netloc
  host because politeness partitions on host.
- basename key: hepcrawl/middlewares.py:157-165 uses
  ``basename(urlparse(url).path)`` as the crawl-once key;
  hepcrawl/pipelines.py:97-99 likewise for stored files.

Canonicalization rules (documented contract, tested in tests/test_urls.py):
  1. scheme and host lowercased
  2. default ports stripped (:80 http, :443 https)
  3. fragment removed
  4. query parameters sorted by (key, value); blank-valued keys kept
  5. empty path -> '/'
  6. percent-escapes uppercased; spaces in query encoded as %20
  7. trailing '?' dropped when query is empty

All Spark entry points are vectorized (pandas/Arrow) — no per-row Python UDFs.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, quote, unquote, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# click-tracking query parameters that never change the resource: the
# classic crawl-dedup leak (the same article under 50 utm_ campaign urls).
# Prefix match for utm_*, exact match for the ad-click ids.
_TRACKING_EXACT = {
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "yclid", "dclid",
    "_hsenc", "_hsmi", "mkt_tok", "oly_anon_id", "oly_enc_id",
}
_TRACKING_PREFIXES = ("utm_",)


def _is_tracking(key: str) -> bool:
    k = key.lower()
    return k in _TRACKING_EXACT or k.startswith(_TRACKING_PREFIXES)

# characters we never re-encode in paths (RFC 3986 sub-delims + unreserved)
_PATH_SAFE = "/;:@&=+$,!*'()-._~"


def canonicalize_url_py(url: str, strip_tracking: bool = False) -> str:
    """Pure-Python canonicalizer (single value). See module contract.

    ``strip_tracking=True`` additionally drops utm_*/gclid-style
    click-tracking parameters (rule 8) — the same page shared through N
    campaigns must collapse to ONE url_seen entry."""
    if url is None:
        return None
    url = url.strip()
    scheme, netloc, path, query, _frag = urlsplit(url)
    scheme = scheme.lower()
    host, sep, port = netloc.partition(":")
    host = host.lower()
    if sep and port == _DEFAULT_PORTS.get(scheme):
        netloc = host
    elif sep:
        netloc = f"{host}:{port}"
    else:
        netloc = host
    # normalize percent-encoding: decode then re-encode with uppercase escapes
    path = quote(unquote(path), safe=_PATH_SAFE) or "/"
    params = parse_qsl(query, keep_blank_values=True)
    if strip_tracking:
        params = [(k, v) for k, v in params if not _is_tracking(k)]
    query = urlencode(sorted(params)) if params else ""
    return urlunsplit((scheme, netloc, path, query, ""))


@pandas_udf(StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer: Series[str] -> Series[str]."""
    return urls.map(canonicalize_url_py, na_action="ignore")


@pandas_udf(StringType())
def canonicalize_url_dedup(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer for DEDUP keys: the module contract plus
    tracking-parameter stripping (rule 8)."""
    return urls.map(
        lambda u: canonicalize_url_py(u, strip_tracking=True),
        na_action="ignore",
    )


def host_of(url: Column | str) -> Column:
    """Politeness host key — JVM-side parse_url, codegen'd."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.parse_url(c, F.lit("HOST")))


def path_of(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.parse_url(c, F.lit("PATH"))


def basename_of(url: Column | str) -> Column:
    """Crawl-once key (middlewares.py:157-165): basename of the URL path."""
    return F.element_at(F.split(path_of(url), "/"), -1)
