"""URL canonicalization + hashing as pure column expressions.

North-rule semantics (BASELINE.json): lowercase scheme+host, strip
fragments, strip default ports (http:80 / https:443), sort query params.
The reference delegates canonicalization to the crawl4ai library
(/root/reference/original-README.md:525 area — URL normalization is
library-side); the rule above is the authoritative spec.

The expression is emitted as a SQL string per dialect ("spark" |
"duckdb") from ONE template, so the engine plan and the DuckDB
correctness oracle share a single definition. On the Spark side the
string goes through ``F.expr`` — it stays JVM-side inside whole-stage
codegen; there is no Python in this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RX = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_AUTH_RX = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
_PATH_RX = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RX = r"\?([^#]*)"


def _lit(pattern: str, dialect: str) -> str:
    """Quote a regex as a SQL string literal for the dialect."""
    if dialect == "spark":
        # Spark SQL string literals process backslash escapes.
        return "'" + pattern.replace("\\", "\\\\") + "'"
    return "'" + pattern + "'"  # duckdb: no backslash processing


def _sort_join(arr_of: str, dialect: str) -> str:
    if dialect == "spark":
        return f"array_join(array_sort(split({arr_of}, '&')), '&')"
    return f"array_to_string(list_sort(string_split({arr_of}, '&')), '&')"


def canonicalize_sql(url_expr: str, dialect: str = "spark") -> str:
    """SQL expression canonicalizing ``url_expr`` (dialect: spark|duckdb)."""
    d = dialect
    nf = f"regexp_replace({url_expr}, {_lit('#.*$', d)}, '')"  # strip fragment
    scheme = f"lower(regexp_extract({nf}, {_lit(_SCHEME_RX, d)}, 1))"
    hostport = f"lower(regexp_extract({nf}, {_lit(_AUTH_RX, d)}, 1))"
    host = f"regexp_replace({hostport}, {_lit(':[0-9]+$', d)}, '')"
    port = f"regexp_extract({hostport}, {_lit(':([0-9]+)$', d)}, 1)"
    raw_path = f"regexp_extract({nf}, {_lit(_PATH_RX, d)}, 1)"
    path = f"(CASE WHEN {raw_path} = '' THEN '/' ELSE {raw_path} END)"
    query = f"regexp_extract({nf}, {_lit(_QUERY_RX, d)}, 1)"
    keep_port = (
        f"(CASE WHEN {port} = '' THEN '' "
        f"WHEN {scheme} = 'http' AND {port} = '80' THEN '' "
        f"WHEN {scheme} = 'https' AND {port} = '443' THEN '' "
        f"ELSE concat(':', {port}) END)"
    )
    qpart = f"(CASE WHEN {query} = '' THEN '' ELSE concat('?', {_sort_join(query, d)}) END)"
    canon = f"concat({scheme}, '://', {host}, {keep_port}, {path}, {qpart})"
    # Non-absolute URLs (no scheme://) pass through trimmed+lowered.
    return f"(CASE WHEN {scheme} = '' THEN lower(trim({url_expr})) ELSE {canon} END)"


# Charset of a valid scheme after the first char ([a-zA-Z0-9+.-]) — used
# by the translate()-based scheme test below (empty translate result ⇒
# every char is in the set).
_SCHEME_CHARS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789+.-"


def _split_url(c: Column) -> dict[str, Column]:
    """Decompose a URL column with substring arithmetic — no regex.

    The crawl engine canonicalizes EVERY extracted link, so this runs
    a billion-plus times per generation; the regexp_extract chain it
    replaces measured 6.5 s/M URLs at one core vs ~1.0 s for this form
    (java.util.regex find vs UTF8String indexOf — same whole-stage
    codegen span either way). Semantics are pinned to the regex spec in
    ``canonicalize_sql``/``canonicalize_py`` by the three-way
    conformance tests in tests/test_urls.py; the field-by-field
    equivalences are argued inline."""
    nf = F.substring_index(c, "#", 1)          # ≡ regexp_replace('#.*$','')
    # scheme = text before the FIRST '://' iff that prefix matches
    # ^[a-zA-Z][a-zA-Z0-9+.\-]*$ (translate leaves '' iff all chars are
    # in the set; anchoring comes free because pre is the whole prefix).
    pre = F.substring_index(nf, "://", 1)      # pre == nf ⇔ no '://'
    first = F.substr(pre, F.lit(1), F.lit(1))
    first_alpha = ((first >= "a") & (first <= "z")) | (
        (first >= "A") & (first <= "Z"))
    scheme_ok = (
        (F.length(pre) < F.length(nf))         # '://' present
        & first_alpha
        & (F.translate(pre, _SCHEME_CHARS, "") == "")
    )
    scheme = F.lower(pre)
    rest = F.substr(nf, F.length(pre) + F.lit(4))
    # authority = rest up to the first '/' or '?' ('#' already stripped)
    # ≡ ([^/?#]*); path+query is the exact remainder.
    authority = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    hostport = F.lower(authority)
    # port split ≡ s/:[0-9]+$//: the text after the LAST ':' is a port
    # iff it is non-empty and all-digits.
    tail = F.substring_index(hostport, ":", -1)  # == hostport ⇔ no ':'
    is_port = (
        (F.length(tail) < F.length(hostport))
        & (tail != "")
        & (F.translate(tail, "0123456789", "") == "")
    )
    host = F.when(
        is_port,
        F.substr(hostport, F.lit(1),
                 F.length(hostport) - F.length(tail) - F.lit(1)),
    ).otherwise(hostport)
    port = F.when(is_port, tail).otherwise(F.lit(""))
    pq = F.substr(rest, F.length(authority) + F.lit(1))
    raw_path = F.substring_index(pq, "?", 1)   # ≡ ([^?#]*) after authority
    # query ≡ search '\?([^#]*)': everything after the FIRST '?' (which,
    # given authority stops at '?', is pq's first '?') to end-of-nf.
    query = F.when(
        F.length(raw_path) < F.length(pq),     # '?' present in pq
        F.substr(pq, F.length(raw_path) + F.lit(2)),
    ).otherwise(F.lit(""))
    return {
        "scheme_ok": scheme_ok, "scheme": scheme, "host": host,
        "port": port, "raw_path": raw_path, "query": query,
    }


def canonicalize(url: Column | str,
                 strip_params: tuple[str, ...] | None = None) -> Column:
    """Spark Column: canonical form of a URL column.

    Column-API mirror of ``canonicalize_sql`` (tests assert the Spark,
    DuckDB and Python forms agree on a corpus of tricky URLs). All
    built-in string functions — stays inside whole-stage codegen, and
    (unlike the SQL/Python twins) regex-free: see ``_split_url``.

    ``strip_params``: query-parameter names dropped BEFORE the sorted
    rebuild — the content-irrelevant parameters (session ids, click
    trackers) a dust_params run learns, applied at canonicalization so
    aliases fold in the URL-seen set instead of multiplying the
    frontier. A URL whose every parameter is stripped canonicalizes to
    its bare path (no dangling '?').
    """
    c = F.col(url) if isinstance(url, str) else url
    u = _split_url(c)
    scheme, host, port, query = u["scheme"], u["host"], u["port"], u["query"]
    path = F.when(u["raw_path"] == "", F.lit("/")).otherwise(u["raw_path"])
    portpart = (
        F.when(port == "", F.lit(""))
        .when((scheme == "http") & (port == "80"), F.lit(""))
        .when((scheme == "https") & (port == "443"), F.lit(""))
        .otherwise(F.concat(F.lit(":"), port))
    )
    pairs = F.split(query, "&")
    if strip_params:
        keep = list(strip_params)
        pairs = F.filter(
            pairs, lambda p: ~F.get(F.split(p, "="), 0).isin(keep))
    sorted_q = F.array_join(F.array_sort(pairs), "&")
    # Nested whens so split/sort/join run ONLY on rows with a query
    # string (a few % of links): as a top-level `(query=='') | (…)`
    # disjunct, sorted_q was evaluated on EVERY row — measured 3.1 s/M
    # URLs at one core, half the whole canonicalize cost. The inner
    # sorted_q=='' arm keeps the strip_params-empties-everything case.
    qpart = F.when(query == "", F.lit("")).otherwise(
        F.when(sorted_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)))
    canon = F.concat(scheme, F.lit("://"), host, portpart, path, qpart)
    # Branch selection via get(array(...), idx), NOT when(...): codegen's
    # subexpression elimination skips expressions that appear only inside
    # when-branches, so when(ok, canon).otherwise(fallback) re-evaluates
    # every substring chain per reference (measured 5.2 s/M vs 2.6 s/M at
    # one core). Array children are unconditional — both branches compute
    # once (the fallback is two cheap ops), the bool picks the element.
    return _pick(u["scheme_ok"], canon, F.lower(F.trim(c)))


def _pick(cond: Column, if_true: Column, if_false: Column) -> Column:
    """CSE-friendly two-way select: see the note in ``canonicalize``."""
    return F.get(F.array(if_false, if_true), cond.cast("int"))


def url_host(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    u = _split_url(c)
    # regex twin returned '' when the scheme failed to match (no capture)
    return _pick(u["scheme_ok"], u["host"], F.lit(""))


def url_path(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    u = _split_url(c)
    p = _pick(u["scheme_ok"], u["raw_path"], F.lit(""))
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_hash(canon_url: Column | str) -> Column:
    """xxhash64 of the canonical URL — the frontier/seen-set key.

    64-bit xxhash over ~1e10 URLs → collision expectation ≈ 2.7e-? —
    birthday bound ~ (1e10)^2 / 2^65 ≈ 2.7; the exact-URL anti-join
    (not the hash) remains the ground truth, the hash is the shuffle key.
    """
    c = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    return F.xxhash64(c)


def _rep_regex(pattern: Column) -> Column:
    """Anchored Java regex for an RFC 9309 path pattern: regex metachars
    escaped, ``*`` → ``.*``, and a TRAILING ``$`` (only — RFC 9309 §2.2.3
    treats mid-pattern ``$`` as a literal octet) → end-of-input anchor."""
    esc = F.regexp_replace(pattern, r"([\\.\[\]\{\}\(\)\|\^\$\+\?])", r"\\$1")
    rx = F.replace(esc, F.lit("*"), F.lit(".*"))
    rx = F.regexp_replace(rx, r"\\\$\z", r"\$")
    return F.concat(F.lit("^"), rx)


def rep_match(path: Column, pattern: Column) -> Column:
    """RFC 9309 §2.2.3 rule match: plain patterns are prefix matches
    (the fast path — no regex compile); patterns containing ``*`` or
    ending in ``$`` go through the wildcard regex. Pure column exprs —
    evaluated under a broadcast join, rules arrays are per-host small."""
    has_wild = pattern.contains("*") | pattern.endswith("$")
    return F.when(has_wild, F.regexp_like(path, _rep_regex(pattern))) \
        .otherwise(path.startswith(pattern))


def rep_best_match(path: Column, rules: Column) -> Column:
    """Longest matching rule's specificity (octet length of the PATTERN,
    RFC 9309 §2.2.2 "most octets" — wildcard octets count, matching
    Google's reference matcher), 0 when nothing matches / rules null."""
    lens = F.transform(
        F.coalesce(rules, F.array().cast("array<string>")),
        lambda p: F.when(rep_match(path, p), F.length(p)).otherwise(F.lit(0)),
    )
    return F.coalesce(F.array_max(lens), F.lit(0))


def rep_match_py(path: str, pattern: str) -> bool:
    """Pure-Python twin of ``rep_match`` for the sequential oracle."""
    import re

    if "*" not in pattern and not pattern.endswith("$"):
        return path.startswith(pattern)
    rx = re.escape(pattern).replace(r"\*", ".*")
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    return re.match(rx, path) is not None


def rep_best_py(path: str, rules: list[str]) -> int:
    """Pure-Python twin of ``rep_best_match``."""
    return max((len(p) for p in rules if rep_match_py(path, p)), default=0)


def url_host_py(url: str) -> str:
    import re

    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", url)
    return re.sub(r":[0-9]+$", "", (m.group(1) if m else "").lower())


def url_path_py(url: str) -> str:
    import re

    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", url)
    return (m.group(1) if m else "") or "/"


def canonicalize_py(url: str) -> str:
    """Pure-Python mirror of ``canonicalize_sql`` for the sequential oracle."""
    import re

    nf = re.sub(r"#.*$", "", url)
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", nf)
    if not m:
        return url.strip().lower()
    scheme = m.group(1).lower()
    am = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", nf)
    hostport = (am.group(1) if am else "").lower()
    host = re.sub(r":[0-9]+$", "", hostport)
    pm = re.search(r":([0-9]+)$", hostport)
    port = pm.group(1) if pm else ""
    pathm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", nf)
    path = pathm.group(1) if pathm else ""
    path = path or "/"
    qm = re.search(r"\?([^#]*)", nf)
    query = qm.group(1) if qm else ""
    portpart = ""
    if port and not ((scheme == "http" and port == "80") or (scheme == "https" and port == "443")):
        portpart = ":" + port
    qpart = "?" + "&".join(sorted(query.split("&"))) if query else ""
    return f"{scheme}://{host}{portpart}{path}{qpart}"


# canonicalize lowercases schemes of shape [a-zA-Z][a-zA-Z0-9+.-]* —
# the SURT splitter must accept the same charset (s3://, svn+ssh://…)
_SURT_SCHEME = "[a-z][a-z0-9+.-]*"


def surt_key_sql(canon_expr: str, dialect: str = "spark") -> str:
    """SQL twin of ``surt_key`` over an ALREADY-canonical URL."""
    hostport = f"regexp_extract({canon_expr}, {_lit('^' + _SURT_SCHEME + '://([^/]+)', dialect)}, 1)"
    host = f"regexp_replace({hostport}, {_lit(':[0-9]+$', dialect)}, '')"
    port = f"regexp_extract({hostport}, {_lit('(:[0-9]+)$', dialect)}, 1)"
    rest = f"regexp_replace({canon_expr}, {_lit('^' + _SURT_SCHEME + '://[^/]*', dialect)}, '')"
    if dialect == "spark":
        rev = f"array_join(reverse(split({host}, '\\\\.')), ',')"
    else:
        rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    surt = f"concat({rev}, {port}, ')', {rest})"
    # non-absolute values (canonicalize's lower(trim) pass-through) keep
    # their own text as the key instead of collapsing into one ')…' range
    return f"(CASE WHEN {hostport} = '' THEN {canon_expr} ELSE {surt} END)"


def surt_key(canon_url: Column | str) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform — the
    Internet-Archive/Common-Crawl CDX index key) of an ALREADY-canonical
    URL: host labels reversed and comma-joined, non-default port kept,
    scheme dropped: ``https://sub.example.com/p?a=1`` →
    ``com,example,sub)/p?a=1``.

    Why it exists at 100 TB: sorting/range-partitioning frontier and
    page tables by SURT clusters every URL of a domain (and its
    subdomains) contiguously, so per-domain scans, politeness audits,
    and index lookups become partition-pruned range reads instead of
    full scans — the same reason CDX indexes sort this way."""
    c = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    hostport = F.regexp_extract(c, f"^{_SURT_SCHEME}://([^/]+)", 1)
    host = F.regexp_replace(hostport, ":[0-9]+$", "")
    port = F.regexp_extract(hostport, "(:[0-9]+)$", 1)
    rest = F.regexp_replace(c, f"^{_SURT_SCHEME}://[^/]*", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.when(hostport == "", c).otherwise(
        F.concat(rev, port, F.lit(")"), rest))


# --------------------------------------------------------------------------- #
# Registrable domain (public-suffix rule)
# --------------------------------------------------------------------------- #
# Representative multi-label public suffixes (the shape of the Mozilla
# Public Suffix List; a production deployment broadcasts the full PSL —
# same expressions, longer IN list). Rule: if the host's last TWO labels
# form a public suffix, the registrable domain is the last THREE labels;
# otherwise the last two. Single-label hosts and IP literals are their
# own key.
PUBLIC_SUFFIXES_2 = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "com.ar", "com.tr", "co.nz", "web.id",
    # private-registry suffixes the PSL also carries: every user site is
    # an independent registrant, so politeness must NOT group them
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
]

_IP_RX = r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$"


def registrable_domain(host: Column | str) -> Column:
    """Registrable domain (PSL eTLD+1) of an already-lowercased host:
    ``a.b.news.example.co.uk`` → ``example.co.uk``; ``x.github.io`` →
    ``x.github.io`` stays its own registrant. Why it exists: per-host
    politeness under-throttles a site that shards itself across
    subdomains (img1…img9.example.com are ONE origin server farm), and
    over-throttles multi-tenant suffixes (every *.github.io is a
    DIFFERENT owner) — budgets, crawl-trap stats, and blocklists group
    by THIS key. Pure column expressions (whole-stage codegen)."""
    h = F.col(host) if isinstance(host, str) else host
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.get(labels, n - 2), F.get(labels, n - 1))
    last3 = F.concat_ws(
        ".", F.get(labels, n - 3), F.get(labels, n - 2), F.get(labels, n - 1))
    is_ps2 = last2.isin(PUBLIC_SUFFIXES_2)
    return (
        F.when(h.rlike(_IP_RX) | (n <= 1), h)
        .when(is_ps2 & (n >= 3), last3)
        .when(is_ps2, h)          # host IS a public suffix: its own key
        .otherwise(last2)
    )


def registrable_domain_sql(host_expr: str, dialect: str = "spark") -> str:
    """SQL twin of ``registrable_domain`` (DuckDB lists are 1-based)."""
    in_list = ", ".join(f"'{s}'" for s in PUBLIC_SUFFIXES_2)
    if dialect == "spark":
        labels, n = f"split({host_expr}, '\\\\.')", f"size(split({host_expr}, '\\\\.'))"
        get = lambda i: f"get({labels}, {n} - {i})"  # noqa: E731  0-based
        # _lit doubles the backslashes for Spark SQL literal unescaping —
        # a raw f-string embed would turn '\.' into '.' (any char)
        ip = f"{host_expr} rlike {_lit(_IP_RX, 'spark')}"
    else:
        labels, n = f"string_split({host_expr}, '.')", f"len(string_split({host_expr}, '.'))"
        get = lambda i: f"{labels}[{n} - {i} + 1]"  # noqa: E731  1-based
        ip = f"regexp_matches({host_expr}, {_lit(_IP_RX, 'duckdb')})"
    last2 = f"concat_ws('.', {get(2)}, {get(1)})"
    last3 = f"concat_ws('.', {get(3)}, {get(2)}, {get(1)})"
    return (
        f"(CASE WHEN {ip} OR {n} <= 1 THEN {host_expr} "
        f"WHEN {last2} IN ({in_list}) AND {n} >= 3 THEN {last3} "
        f"WHEN {last2} IN ({in_list}) THEN {host_expr} "
        f"ELSE {last2} END)"
    )


def registrable_domain_py(host: str) -> str:
    """Pure-Python mirror of ``registrable_domain`` for the sequential
    crawl oracle (tests assert Spark == DuckDB == this)."""
    import re

    if re.match(_IP_RX, host):
        return host
    labels = host.split(".")
    if len(labels) <= 1:
        return host
    last2 = ".".join(labels[-2:])
    if last2 in PUBLIC_SUFFIXES_2:
        return ".".join(labels[-3:]) if len(labels) >= 3 else host
    return last2
