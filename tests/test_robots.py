"""RFC 9309 robots parser + JVM-side longest-match application."""
from __future__ import annotations

from askg_spark import robots as R

TXT = """
# politeness
User-agent: badbot
Disallow: /

User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.zip$
Allow:

User-agent: askg-spark
User-agent: otherbot
Disallow: /only-askg/
"""


def test_group_selection_longest_agent_match():
    # exact-agent group beats the * group; token sharing (two
    # User-agent lines) applies the rule to both agents
    assert R.parse_robots_txt(TXT, "askg-spark") == [
        (False, "/only-askg/", 11)]
    assert R.parse_robots_txt(TXT, "otherbot-v2") == [
        (False, "/only-askg/", 11)]


def test_star_group_and_empty_disallow():
    rules = R.parse_robots_txt(TXT, "randombot")
    assert (False, "/private/", 9) in rules
    assert (True, "/private/ok", 11) in rules
    assert (False, "/*.zip$", 7) in rules
    # 'Allow:' with empty value emits no rule
    assert all(pat for _, pat, _ in rules)


def test_pattern_to_like():
    assert R._pattern_to_like("/*.zip$") == "/%.zip"
    assert R._pattern_to_like("/a") == "/a%"
    assert R._pattern_to_like("/a%b_c") == "/a\\%b\\_c%"


def test_apply_longest_match_wins(spark):
    robots_df = spark.createDataFrame(
        [("d1", TXT), ("d2", None)], "domain string, robots_txt string")
    rules = R.robots_rules(robots_df, agent="randombot")
    urls = spark.createDataFrame(
        [("d1", "/private/x"), ("d1", "/private/ok/y"),
         ("d1", "/private/ok/y.zip"),  # Allow len 11 beats /*.zip$ len 7
         ("d1", "/pub/a.zip"), ("d1", "/pub/a.zipx"), ("d1", "/open"),
         ("d2", "/private/x")],
        "domain string, path string")
    got = {(r.domain, r.path): r.allowed
           for r in R.apply_robots(urls, rules).collect()}
    assert got == {
        ("d1", "/private/x"): 0,
        ("d1", "/private/ok/y"): 1,
        ("d1", "/private/ok/y.zip"): 1,
        ("d1", "/pub/a.zip"): 0,
        ("d1", "/pub/a.zipx"): 1,
        ("d1", "/open"): 1,
        ("d2", "/private/x"): 1,
    }


def test_apply_plan_is_broadcast(spark):
    robots_df = spark.createDataFrame(
        [("d1", TXT)], "domain string, robots_txt string")
    rules = R.robots_rules(robots_df)
    urls = spark.createDataFrame(
        [("d1", "/x")], "domain string, path string")
    plan = R.apply_robots(urls, rules)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_apply_preserves_duplicate_rows(spark):
    robots_df = spark.createDataFrame(
        [("d1", TXT)], "domain string, robots_txt string")
    rules = R.robots_rules(robots_df, agent="randombot")
    urls = spark.createDataFrame(
        [("d1", "/private/x"), ("d1", "/private/x"), ("d1", "/open")],
        "domain string, path string")
    out = R.apply_robots(urls, rules).collect()
    assert len(out) == 3  # duplicates survive, one row per input row
    assert sorted((r.path, r.allowed) for r in out) == [
        ("/open", 1), ("/private/x", 0), ("/private/x", 0)]
