"""RFC 9309 robots.txt parsing + longest-match URL evaluation."""

import duckdb
from pyspark.sql import functions as F

from mundipy_spark.operators import robots as R

ROBOTS = """# corpus crawler policy
User-agent: googlebot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/pub/
Disallow: /tmp
Disallow:
Allow: /private/pub/deep/  # trailing comment
"""

URLS = [
    ("https://site.org/", True),            # no matching rule
    ("https://site.org/private/a", False),  # disallow /private/
    ("https://site.org/private/pub/x", True),   # longer allow wins
    ("https://site.org/private/pub/deep/y", True),
    ("https://site.org/tmpfile", False),    # prefix match, no slash needed
    ("https://site.org/public", True),
    ("https://other.org/private/a", True),  # host without robots
    ("https://SITE.org/private/b", False),  # host case-folded
]


def _frames(spark):
    robots = spark.createDataFrame(
        [("site.org", ROBOTS)], "host string, body string"
    )
    urls = spark.createDataFrame([(u,) for u, _ in URLS], "url string")
    return robots, urls


def test_parse_robots_star_group_only(spark):
    robots, _ = _frames(spark)
    rules = {
        (r.allow, r.prefix) for r in R.parse_robots(robots).collect()
    }
    assert rules == {
        (False, "/private/"),
        (True, "/private/pub/"),
        (False, "/tmp"),
        (True, "/private/pub/deep/"),
    }


MULTI_UA = """User-agent: *
User-agent: googlebot
Disallow: /x

User-agent: bingbot
User-agent: *
Allow: /x/pub
Disallow: /y
"""


def test_parse_robots_multi_agent_group(spark):
    """RFC 9309 §2.2.1: consecutive User-agent lines share ONE rule
    block, so rules under `* \\n googlebot` apply to `*` too — and a
    group where `*` is the SECOND UA line still applies."""
    robots = spark.createDataFrame(
        [("m.org", MULTI_UA)], "host string, body string"
    )
    rules = {(r.allow, r.prefix) for r in R.parse_robots(robots).collect()}
    assert rules == {(False, "/x"), (True, "/x/pub"), (False, "/y")}

    # twin stays in sync
    con = duckdb.connect()
    con.execute("CREATE TABLE r(host varchar, body varchar)")
    con.execute("INSERT INTO r VALUES (?, ?)", ["m.org", MULTI_UA])
    q = R.robots_rules_sql("SELECT host, body FROM r")
    drules = {(r[1], r[2]) for r in con.execute(q).fetchall()}
    assert drules == rules


def test_robots_allowed_longest_match(spark):
    robots, urls = _frames(spark)
    rules = R.parse_robots(robots)
    got = {r.url: r.allowed for r in R.robots_allowed(urls, rules).collect()}
    assert got == {u: want for u, want in URLS}


def test_robots_url_stream_never_shuffles(spark):
    robots, urls = _frames(spark)
    rules = R.parse_robots(robots)
    plan = (
        R.robots_allowed(urls, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_robots_cross_engine_parity(spark):
    robots, urls = _frames(spark)
    sdf = R.robots_allowed(urls, R.parse_robots(robots))
    srows = {r.url: (r.host, r.path, r.allowed) for r in sdf.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE r(host varchar, body varchar)")
    con.execute("INSERT INTO r VALUES (?, ?)", ["site.org", ROBOTS])
    con.execute("CREATE TABLE u(url varchar)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u, _ in URLS])
    q = R.robots_allowed_sql("SELECT url FROM u", "SELECT host, body FROM r")
    drows = {r[0]: (r[1], r[2], r[3]) for r in con.execute(q).fetchall()}
    assert srows == drows


def test_frontier_politeness_rounds(spark):
    """k URLs per host per round, priority-ordered, cap drops the
    tail."""
    from mundipy_spark.operators import frontier

    rows = [
        (f"https://h{i % 2}.org/p/{i}", float(100 - i)) for i in range(10)
    ]
    urls = spark.createDataFrame(rows, "url string, priority double")
    all_rows = frontier.schedule_frontier(
        urls, k_per_round=2, max_rounds=2
    ).collect()
    # nothing is silently dropped: capped URLs come back deferred=true
    assert len(all_rows) == 10
    deferred = [r for r in all_rows if r.deferred]
    assert len(deferred) == 2 and all(r.round > 2 for r in deferred)
    out = [r for r in all_rows if not r.deferred]
    by_host_round = {}
    for r in out:
        by_host_round.setdefault((r.host, r.round), []).append(r)
    # cap: at most 2 rounds of 2 per host -> 8 fetchable rows
    assert len(out) == 8
    for (_, rnd), grp in by_host_round.items():
        assert rnd <= 2 and len(grp) <= 2
    # within a host, earlier rounds hold strictly higher-or-equal
    # priority than later rounds
    for host in ("h0.org", "h1.org"):
        r1 = [r.priority for r in by_host_round[(host, 1)]]
        r2 = [r.priority for r in by_host_round[(host, 2)]]
        assert min(r1) >= max(r2)
