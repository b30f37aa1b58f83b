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


class Rfc9309Matcher:
    """Minimal RFC 9309 robots.txt evaluator (longest-match semantics).

    Implements the normative matching rules of RFC 9309:

      * **group selection** (§2.2.1): the crawler obeys the group whose
        ``User-agent`` line is the LONGEST case-insensitive prefix of its
        product token; ``*`` is the fallback group.  Multiple groups with
        the same (winning) user-agent value merge their rules.
      * **rule matching** (§2.2.2): among all ``Allow``/``Disallow``
        rules whose path pattern matches the URL's path(+query), the rule
        with the LONGEST pattern (most octets) wins; on a tie, ``Allow``
        wins.  An empty ``Disallow:`` value matches nothing (allow all).
      * patterns support the ``*`` wildcard and the ``$`` end anchor
        (§2.2.3).
      * a URL with no matching rule is allowed.

    This differs from the stdlib ``urllib.robotparser`` (first-match in
    file order) exactly where real robots files differ: a broad
    ``Disallow`` listed before a narrower ``Allow`` blocks under the
    stdlib but allows under the RFC.  Pure stdlib + ``re``; one compiled
    rule list per robots body (memoized per worker by the kernel).
    """

    def __init__(self, text: str, agent: str = "*") -> None:
        import re as _re

        groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        uas: list[str] = []
        rules: list[tuple[bool, str]] = []
        in_group = False  # saw at least one rule since the last UA line
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if in_group:
                    groups.append((uas, rules))
                    uas, rules, in_group = [], [], False
                uas.append(val.lower())
            elif key in ("allow", "disallow"):
                if not uas:
                    continue  # rule before any user-agent line: ignored
                in_group = True
                if val == "" and key == "disallow":
                    continue  # empty Disallow matches nothing
                if val != "":
                    rules.append((key == "allow", val))
            # other keys (crawl-delay, sitemap, ...) end nothing per RFC
        if uas:
            groups.append((uas, rules))

        tok = agent.lower()
        best = -1
        for g_uas, _ in groups:
            for ua in g_uas:
                if ua != "*" and tok.startswith(ua) and len(ua) > best:
                    best = len(ua)
        selected: list[tuple[bool, str]] = []
        for g_uas, g_rules in groups:
            for ua in g_uas:
                hit = (
                    (best >= 0 and ua != "*" and tok.startswith(ua)
                     and len(ua) == best)
                    or (best < 0 and ua == "*")
                )
                if hit:
                    selected.extend(g_rules)
                    break

        self._rules: list[tuple[bool, int, object]] = []
        for is_allow, pat in selected:
            spec = len(pat.encode("utf-8"))  # octet length = specificity
            anchored = pat.endswith("$")
            body = pat[:-1] if anchored else pat
            rx = ".*".join(_re.escape(p) for p in body.split("*"))
            rx = "^" + rx + ("$" if anchored else "")
            try:
                self._rules.append((is_allow, spec, _re.compile(rx)))
            except _re.error:
                continue  # unparseable pattern: skip the rule

    def can_fetch(self, path: str) -> bool:
        """``path`` is the URL's path plus ``?query`` if any; '' ⇒ '/'."""
        if not path.startswith("/"):
            path = "/" + path
        verdict, best_spec = True, -1
        for is_allow, spec, rx in self._rules:
            if rx.match(path) is None:
                continue
            if spec > best_spec or (spec == best_spec and is_allow):
                verdict, best_spec = is_allow, spec
        return verdict


def with_robots_allowed(
    df: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    agent: str = "*",
    *,
    robots_domain_col: str = "domain",
    robots_text_col: str = "robots_txt",
    out_col: str = "robots_allowed",
    semantics: str = "stdlib",
) -> DataFrame:
    """Crawl-politeness gate: evaluate each URL against its domain's
    robots.txt and append a boolean ``out_col``.

    ``semantics`` selects the rule-matching model:

      * ``'stdlib'`` (default) — ``urllib.robotparser``: rules apply
        FIRST-match in file order within the selected user-agent group.
      * ``'rfc9309'`` — :class:`Rfc9309Matcher`: LONGEST-match with
        Allow-wins-ties, ``*``/``$`` pattern support, and
        longest-prefix user-agent group selection, per RFC 9309.

    The two agree on the overwhelmingly common Allow-before-Disallow
    override layout; real crawls hitting Allow/Disallow precedence
    (broad Disallow before narrow Allow) need the rfc9309 mode.

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

    if semantics not in ("stdlib", "rfc9309"):
        raise ValueError(
            f"semantics must be 'stdlib' or 'rfc9309', got {semantics!r}"
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

    rfc = semantics == "rfc9309"

    def kernel(batches):
        import urllib.robotparser
        from urllib.parse import urlsplit

        cache: dict[str, object] = {}

        def parser_for(txt: str):
            rp = cache.get(txt)
            if rp is None:
                if rfc:
                    rp = Rfc9309Matcher(txt, agent)
                else:
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
                    # both matchers evaluate the URL's path+query
                    u = urlsplit(str(url))
                    if not u.netloc:
                        allowed.append(True)
                        continue
                    p = parser_for(str(txt))
                    if rfc:
                        path = u.path + (f"?{u.query}" if u.query else "")
                        allowed.append(p.can_fetch(path))
                    else:
                        allowed.append(
                            bool(p.can_fetch(agent, str(url)))
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
