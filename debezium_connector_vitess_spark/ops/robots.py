"""robots.txt compliance filtering — the crawl-politeness gate of a
web-corpus pipeline (RFC 9309, the Robots Exclusion Protocol).

A Common Crawl-shaped ingest fetches robots.txt once per host and filters
candidate URLs against it BEFORE spending fetch/decode budget; a
training-data pipeline re-applies the same gate when re-deriving a corpus
from stored captures (the crawler's user-agent may differ from the
trainer's). This module implements the protocol's three moving parts:

1. **Parsing** (:func:`parse_robots_txt`): the line grammar — groups of
   ``User-agent`` lines followed by ``Allow``/``Disallow`` rules, comments
   stripped at ``#``, unknown fields (``Sitemap``, ``Crawl-delay``)
   ignored, field names case-insensitive, rules before any group header
   discarded (RFC 9309 §2.2).
2. **Group selection** (:func:`select_agent_rules`): the crawler obeys the
   group whose ``User-agent`` token matches its product token
   (case-insensitive); only when NO specific group matches does the ``*``
   group apply — a matching specific group REPLACES the wildcard rules, it
   does not extend them (RFC 9309 §2.2.1).
3. **Matching** (:func:`filter_robots_allowed`): rule paths are octet
   prefixes of the URL's path+query with two metacharacters — ``*``
   matches any span, a TRAILING ``$`` anchors at the end. The most
   specific (longest octet-length) matching rule wins; on a length tie
   ``Allow`` wins; no matching rule means allowed (RFC 9309 §2.2.2).
   Empty rule paths match nothing and are dropped at parse.

Scale shape: the rules frame is |domains| × a handful of rows — broadcast
it and the gate is one map-side join + one narrow per-URL aggregation
(max of a (pattern_len, is_allow) struct: longer wins, ties resolve to
allow because true > false). URLs whose host has no robots entry, or that
don't parse as URLs at all, pass through allowed — absence of a robots
file permits crawling (RFC 9309 §2.3.1.2~.4 makes unreachable robots
crawl-permissive for 4xx; this engine applies the same default to absent
rows and leaves 5xx/fetch-error policy to the fetcher).

Reference parity note: the reference connector has no crawl plane — this
module belongs to the extension surface (SURVEY.md §2.9), beside
ops/warc.py's capture reader.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_robots_txt",
    "select_agent_rules",
    "canonical_pct",
    "robots_rule_regex",
    "robots_rules",
    "filter_robots_allowed",
]

#: fields that carry group-member rules (lower-cased)
_RULE_FIELDS = frozenset(["allow", "disallow"])


def parse_robots_txt(content: str) -> list[tuple[str, str, str]]:
    """Parse robots.txt text into ``(agent_token, rule, path_pattern)``
    tuples, one per (group member agent, rule) pair — a rule under a group
    with several ``User-agent`` lines is emitted once per agent, so group
    selection can key on single tokens.

    Grammar (RFC 9309 §2.2): ``field: value`` lines; ``#`` starts a
    comment; field names case-insensitive; a run of ``User-agent`` lines
    opens a group whose members are the following Allow/Disallow lines;
    a ``User-agent`` line after rules closes the group and opens a new
    one; rules before any group, unknown fields, and EMPTY rule paths
    (``Disallow:`` alone = no restriction) are dropped. Agent tokens are
    lower-cased; patterns keep their case (URL paths are case-sensitive).

    Grammar corners, pinned (ADVICE r10 — parsers differ here; this module
    follows the RFC's "ignore lines you cannot parse as a known field in a
    valid position" reading, unit-tested in test_ops.py):

    - An ignored field (``Sitemap``, ``Crawl-delay``, ...) is NEUTRAL
      everywhere — between two ``User-agent`` lines it neither closes the
      agent run nor starts the member rules, so
      ``ua: a / Sitemap: ... / ua: b / Disallow: /x`` is ONE group covering
      both agents (the RFC ABNF admits only emptylines between
      startgrouplines; an out-of-position known-global line is ignored, not
      promoted to a separator).
    - A ``User-agent:`` line with an EMPTY value is an invalid
      startgroupline and is ignored WHOLESALE: it neither opens a group nor
      closes the previous run, so following rules still attach to the
      preceding group instead of being orphaned.
    """
    rules: list[tuple[str, str, str]] = []
    agents: list[str] = []
    in_group_rules = False  # rules seen since the last User-agent run
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not value:
                continue  # invalid startgroupline: ignore the LINE entirely
            if in_group_rules:
                agents = []  # rules already closed the previous group
                in_group_rules = False
            agents.append(value.lower())
        elif field in _RULE_FIELDS:
            in_group_rules = True
            if not agents or not value:
                continue  # rule outside any group / empty pattern
            for a in agents:
                rules.append((a, field, value))
        # every other field (sitemap, crawl-delay, ...) is ignored
    return rules


def select_agent_rules(
    rules: list[tuple[str, str, str]], agent: str, *, version_tokens: bool = False
) -> list[tuple[str, str]]:
    """The ``(rule, pattern)`` list the given crawler obeys: the rules of
    the group(s) whose agent token matches ``agent`` (case-insensitive),
    else the ``*`` group's, else nothing (RFC 9309 §2.2.1 — a matching
    specific group replaces the wildcard group entirely).

    ``version_tokens=True`` additionally matches on the PRODUCT TOKEN —
    the part before the first ``/`` on either side — so a robots file
    carrying ``User-agent: TrainingBot/1.2`` governs a crawler identifying
    as ``TrainingBot`` and vice versa (RFC 9309 §2.2.1 matches product
    tokens, not full user-agent strings; real-world files carry versioned
    tokens often enough that the strict-equality default misses them).
    Default False keeps exact-token matching."""
    agent = agent.lower()

    def matches(a: str) -> bool:
        if a == agent:
            return True
        if version_tokens:
            return a.split("/", 1)[0] == agent.split("/", 1)[0]
        return False

    specific = [(r, p) for a, r, p in rules if matches(a)]
    if specific:
        return specific
    return [(r, p) for a, r, p in rules if a == "*"]


_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX_RE = re.compile(r"%[0-9A-Fa-f]{2}")


def canonical_pct(s: str) -> str:
    """Canonical percent-encoding for robots comparison (RFC 9309 §2.2.2 /
    RFC 3986 §2.3-2.4 equivalence, ADVICE r10): every VALID ``%XX`` escape
    is decoded when its octet is unreserved (``%41`` → ``A``) and
    upper-cased otherwise (``%3c`` → ``%3C``); raw octets — including
    reserved ones and ``%`` that starts no valid escape — pass through
    untouched, so an escaped reserved octet stays distinct from its raw
    form (``/foo%2Fbar`` never collapses into ``/foo/bar``). Applied to
    BOTH the rule pattern (at parse) and the URL match string (JVM-side
    twin :func:`_canonical_pct_col`) so mixed encodings compare equal.
    Residual limitation: a RAW non-ASCII octet is only equated with its
    raw form, not with its percent-encoded spelling — both sides raw or
    both sides encoded compare fine."""

    def fix(m: "re.Match[str]") -> str:
        ch = chr(int(m.group(0)[1:], 16))
        return ch if ch in _UNRESERVED else m.group(0).upper()

    return _HEX_RE.sub(fix, s)


def _canonical_pct_col(s: Column) -> Column:
    """JVM-side twin of :func:`canonical_pct` — one split on the
    zero-width ``(?=%)`` boundary plus a per-segment transform, all
    built-ins: the URL frame stays map-side, no Python seam."""
    segs = F.split(s, r"(?=%)")

    def fix(seg: Column) -> Column:
        hex2 = F.upper(F.substring(seg, 2, 2))
        ch = F.char(F.conv(hex2, 16, 10).cast("int"))
        rest = F.substring(seg, 4, 2147483647)
        return (
            F.when(~seg.rlike("^%[0-9A-Fa-f]{2}"), seg)
            .when(ch.rlike("^[A-Za-z0-9._~-]$"), F.concat(ch, rest))
            .otherwise(F.concat(F.lit("%"), hex2, rest))
        )

    return F.array_join(F.transform(segs, fix), "")


def robots_rule_regex(pattern: str) -> str:
    """Java/RE2-safe regex for one rule path: anchored at the start,
    ``*`` spans anything, a TRAILING ``$`` anchors the end, every other
    octet is literal (inner ``$`` included). The pattern is
    percent-canonicalized first (:func:`canonical_pct`) so it matches the
    canonicalized URL octets."""
    pattern = canonical_pct(pattern)
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


ROBOTS_RULES_SCHEMA = (
    "domain string, rule string, pattern string, regex string, plen int"
)


def robots_rules(
    df: DataFrame,
    content_col: str = "robots_txt",
    domain_col: str = "domain",
    *,
    agent: str = "*",
    version_tokens: bool = False,
) -> DataFrame:
    """Distributed robots.txt corpus parse: one row per (domain, rule the
    ``agent`` crawler obeys), with the match regex and the pattern's octet
    length precomputed (the longest-match key). Arrow-batched mapInPandas —
    a robots corpus is |domains|-sized, so the output is broadcastable by
    construction downstream. ``version_tokens`` forwards to
    :func:`select_agent_rules` (product-token matching for versioned
    ``User-agent`` lines)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for dom, content in zip(pdf[domain_col], pdf[content_col]):
                parsed = parse_robots_txt(content if content is not None else "")
                for rule, pattern in select_agent_rules(
                    parsed, agent, version_tokens=version_tokens
                ):
                    # plen (the longest-match precedence key) is the
                    # CANONICAL pattern's octet length, consistent with the
                    # canonicalized octets both sides match on
                    rows.append(
                        (
                            dom, rule, pattern, robots_rule_regex(pattern),
                            len(canonical_pct(pattern).encode("utf-8")),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["domain", "rule", "pattern", "regex", "plen"]
            )

    return df.select(domain_col, content_col).mapInPandas(
        op, schema=ROBOTS_RULES_SCHEMA
    )


def _url_host(url: Column) -> Column:
    """Lower-cased authority with the scheme's DEFAULT port stripped
    (http :80 / https :443, the ``canonical_url_expr`` convention) — a
    robots file governs the authority, and ``http://h:80/`` is the same
    authority as ``http://h/``. Non-default ports stay (a robots corpus
    keyed per-origin keeps them distinct)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    return (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )


def _url_match_str(url: Column) -> Column:
    """The octets robots rules match against: path + '?' + query (fragment
    excluded; an absent path is the root '/')."""
    stripped = F.regexp_replace(F.trim(url), r"#.*$", "")
    path = F.regexp_extract(
        stripped, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    query = F.regexp_extract(stripped, r"\?([^#]*)$", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(query == "", path).otherwise(F.concat(path, F.lit("?"), query))


def filter_robots_allowed(
    urls_df: DataFrame,
    url_col: str,
    rules_df: DataFrame,
) -> DataFrame:
    """Keep the rows robots.txt ALLOWS for the crawler whose rules
    ``rules_df`` carries (the :func:`robots_rules` output, already
    agent-selected). RFC 9309 §2.2.2 precedence, exactly:

    - candidate rules = the host's rules whose pattern matches the URL's
      path+query octets (``*`` spans, trailing ``$`` anchors), both sides
      percent-canonicalized first (:func:`canonical_pct` — mixed
      ``%3c``/``%3C``/decoded-unreserved spellings compare equal, escaped
      reserved octets stay distinct from raw ones);
    - the longest (octet-length) matching pattern wins;
    - equal lengths resolve to Allow;
    - no matching rule, no rules for the host, a port-qualified or absent
      host, or an unparseable URL → allowed.

    Plan shape: the rules fold to ONE array row per host (a |domains|-sized
    shuffle of the rules frame only), broadcast and joined 1:1 — the URL
    frame NEVER shuffles or fans out. The precedence ladder is a single
    JVM-side ``array_max`` over the matching rules' ``(plen, is_allow)``
    structs: longer patterns win the lexicographic compare and true > false
    breaks length ties toward Allow."""
    per_host = rules_df.groupBy(
        F.lower(F.col("domain")).alias("__host")
    ).agg(
        F.collect_list(
            F.struct(
                F.col("plen"),
                (F.col("rule") == "allow").alias("is_allow"),
                F.col("regex"),
            )
        ).alias("__rules")
    )
    marked = urls_df.withColumn("__host", _url_host(F.col(url_col))).withColumn(
        "__match", _canonical_pct_col(_url_match_str(F.col(url_col)))
    )
    joined = marked.join(F.broadcast(per_host), "__host", "left_outer")
    # __match is re-evaluated per array element inside the lambda (Catalyst
    # inlines outer references into higher-order functions) — it is two
    # regexp_extracts and robots groups hold a handful of rules, so the
    # re-evaluation is bounded and map-side; don't hoist a seam for it
    winner = F.array_max(
        F.filter(
            F.col("__rules"),
            # regexp_like, not Column.rlike — rlike only takes a literal
            # pattern; here the pattern is the array element's column
            lambda r: F.regexp_like(F.col("__match"), r["regex"]),
        )
    )
    return (
        joined.withColumn("__winner", winner)
        .filter(F.col("__winner").isNull() | F.col("__winner.is_allow"))
        .select(*urls_df.columns)
    )
