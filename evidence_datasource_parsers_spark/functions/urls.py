"""URL canonicalization for crawl dedup.

Before any content-level dedup, a crawl pipeline collapses URL aliases —
``HTTP://Example.com:80/a?utm_source=x&b=1#frag`` and
``http://example.com/a?b=1`` are the same fetch.  Everything here is native
Spark SQL expressions (regexp + higher-order array functions): a narrow
per-row projection, no UDF, no shuffle, fully pushdown-compatible.

Canonical form applied by :func:`canonicalize_url`:

  * scheme and host lowercased; default ports (:80 http, :443 https)
    stripped;
  * tracking parameters dropped (utm_*, fbclid, gclid, msclkid, mc_cid,
    mc_eid, igshid, ref_src);
  * remaining query parameters SORTED (param order is almost never
    semantic; sorting makes the form canonical);
  * fragment dropped (never sent to the server);
  * trailing slash trimmed from non-root paths, empty path → ``/``.

This is deliberately the conservative subset: it never merges URLs that
could be different resources (no case-folding of paths, no param-value
rewriting).  Content-level dedup (operators/dedupe.py) handles what URL
normalization can't see.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref_src)="
)

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def _part(url: Column, i: int) -> Column:
    return F.regexp_extract(url, _URL_RE, i)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s)-style URL (see module doc).
    Strings that do not parse as ``scheme://netloc...`` pass through
    unchanged — canonicalization must never destroy a key it cannot read.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(_part(u, 1))
    netloc = F.lower(_part(u, 2))
    host = F.when(
        (scheme == "http") & netloc.endswith(":80"),
        F.substring_index(netloc, ":80", 1),
    ).otherwise(
        F.when(
            (scheme == "https") & netloc.endswith(":443"),
            F.substring_index(netloc, ":443", 1),
        ).otherwise(netloc)
    )
    raw_path = _part(u, 3)
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(raw_path) > 1) & raw_path.endswith("/"),
            F.regexp_replace(raw_path, r"/+$", ""),
        ).otherwise(raw_path)
    )
    raw_query = _part(u, 4)  # includes leading '?' or ''
    params = F.filter(
        F.split(F.regexp_replace(raw_query, r"^\?", ""), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when(scheme == "", u).otherwise(canon)


def registrable_domain(url: Column | str) -> Column:
    """Best-effort registrable domain of a URL's host: last two labels,
    or last three when the host ends in a common two-level public suffix
    (co.uk, com.au, ...).  A heuristic subset of the Public Suffix List —
    good enough for per-domain mixing/throttling stats; swap in a full PSL
    table join where exactness matters."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(_part(u, 2))
    host = F.substring_index(host, ":", 1)  # strip port
    labels = F.split(host, r"\.")
    n = F.size(labels)
    two_level = host.rlike(
        r"\.(co|com|org|net|gov|ac|edu)\.(uk|au|nz|jp|za|in|br)$"
    )
    take = F.when(two_level, F.lit(3)).otherwise(F.lit(2))
    take = F.least(take, n)
    return F.when(
        host == "", F.lit(None).cast("string")
    ).otherwise(F.array_join(F.slice(labels, n - take + 1, take), "."))


def dedupe_by_url(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Keep one row (min id) per canonical URL — the cheap first pass
    before content dedup; same min-id representative rule as
    ``operators.dedupe.exact_dedupe``, grouped on the canonical string."""
    canon = canonicalize_url(F.col(url_col))
    hashed = df.withColumn("__cu", canon)
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        hashed.groupBy("__cu")
        .agg(F.min_by(row, F.col(id_col)).alias("__row"))
        .select("__row.*")
    )


def filter_urls(
    df: DataFrame,
    url_col: str,
    *,
    allow_domains: list[str] | None = None,
    block_domains: list[str] | None = None,
    block_patterns: list[str] | None = None,
    keep_null_urls: bool = False,
) -> DataFrame:
    """Crawl-curation URL gate — the blocklist stage every corpus refresh
    runs before spending compute on content (C4/RefinedWeb-style):

      * ``block_domains`` — drop rows whose REGISTRABLE domain is listed
        (so ``spam.example`` also blocks ``cdn.spam.example``);
      * ``allow_domains`` — if given, keep ONLY listed registrable
        domains (allowlist crawls);
      * ``block_patterns`` — Java regexes matched against the canonical
        URL (path-level junk: /tag/, /login, calendars, infinite
        facets…);
      * NULL/unparseable-host URLs drop unless ``keep_null_urls``.

    Scale shape: domain lists are LITERAL IN-PLAN SETS (isin) — the right
    encoding up to ~10⁴ entries, after which pass a domain FRAME and
    anti-join it (broadcast_if_small) instead; patterns fold into ONE
    alternation regex evaluated once per row.  Everything is native
    expressions: the filter runs in whole-stage codegen and pushes past
    column pruning — zero Python, zero shuffle.
    """
    dom = registrable_domain(F.col(url_col))
    cond = F.lit(True)
    if not keep_null_urls:
        cond = dom.isNotNull()
    if allow_domains is not None:
        # NULL-host rows: a bare isin is NULL for NULL dom and where()
        # drops it, silently overriding keep_null_urls — make the branch
        # explicit either way
        allowed = F.coalesce(
            dom.isin([d.lower() for d in allow_domains]), F.lit(False)
        )
        if keep_null_urls:
            allowed = allowed | dom.isNull()
        cond = cond & allowed
    if block_domains:
        cond = cond & ~F.coalesce(
            dom.isin([d.lower() for d in block_domains]), F.lit(False)
        )
    if block_patterns:
        merged = "(?i)(" + "|".join(f"(?:{p})" for p in block_patterns) + ")"
        cond = cond & ~F.coalesce(
            canonicalize_url(F.col(url_col)).rlike(merged), F.lit(False)
        )
    return df.where(cond)


def with_robots_allowed(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    *,
    robots_domain_col: str = "domain",
    robots_text_col: str = "robots_txt",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Crawl-politeness gate: evaluate each URL against its domain's
    robots.txt (via the stdlib ``urllib.robotparser``) and append a
    boolean ``out_col``.

    Matching semantics are the stdlib's: rules apply FIRST-match in file
    order within the selected user-agent group (RFC 9309 specifies
    longest-match; the two agree on the overwhelmingly common
    Allow-before-Disallow override layout).  Swap the kernel's parser for
    a strict RFC implementation if a deployment needs exact longest-match.

    ``robots`` is a ``(domain, robots_txt)`` frame — one row per
    REGISTRABLE domain, as a robots-fetching stage would materialize it.
    Conventions: a URL with no robots row, a NULL/empty robots body, or a
    NULL/unparseable host is ALLOWED (absent robots means no restrictions;
    a politeness gate must not silently eat rows the way a blocklist
    would — compose with :func:`filter_urls` for that policy).

    Scale shape: one equi-join on the registrable domain — the robots side
    is domains-sized (≪ URLs) and rides ``broadcast_if_small`` — then one
    Arrow kernel that memoizes ONE parsed ``RobotFileParser`` per distinct
    robots body per worker (crawls hit the same domains millions of
    times; the parse cost amortizes to zero).  No shuffle beyond the
    broadcast join.
    """
    from evidence_datasource_parsers_spark.operators.joins import (
        broadcast_if_small,
    )

    rb = robots.select(
        F.col(robots_domain_col).alias("__rdom"),
        F.col(robots_text_col).alias("__rtxt"),
    )
    joined = df.join(
        broadcast_if_small(rb),
        registrable_domain(F.col(url_col)).eqNullSafe(F.col("__rdom")),
        how="left",
    ).drop("__rdom")
    id_like = [c for c in df.columns]

    def kernel(batches):
        import urllib.robotparser
        from urllib.parse import urlsplit

        import pandas as pd

        cache: dict[str, "urllib.robotparser.RobotFileParser"] = {}

        def parser_for(txt: str):
            rp = cache.get(txt)
            if rp is None:
                rp = urllib.robotparser.RobotFileParser()
                rp.parse(txt.splitlines())
                cache[txt] = rp
            return rp

        for pdf in batches:
            allowed = []
            for url, txt in zip(pdf[url_col], pdf["__rtxt"]):
                if txt is None or not str(txt).strip() or url is None:
                    allowed.append(True)
                    continue
                try:
                    # robotparser matches on the full URL's path+query
                    u = urlsplit(str(url))
                    if not u.netloc:
                        allowed.append(True)
                        continue
                    allowed.append(
                        bool(parser_for(str(txt)).can_fetch(agent, str(url)))
                    )
                except Exception:  # noqa: BLE001 — malformed robots ⇒ allow
                    allowed.append(True)
            out = pdf[id_like].copy()
            out[out_col] = allowed
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} boolean"
    return joined.mapInPandas(kernel, schema)


def filter_by_robots(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    **kwargs,
) -> DataFrame:
    """Keep only robots-allowed URLs — :func:`with_robots_allowed` + a
    filter, dropping the audit column."""
    flagged = with_robots_allowed(df, robots, url_col, agent, **kwargs)
    return flagged.where(F.col("robots_allowed")).drop("robots_allowed")
