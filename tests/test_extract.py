"""P4 extraction goldens: handcrafted HTML -> exact mention fields, plus
quarantine rules and the byte-identical-text invariant."""
from __future__ import annotations

from datetime import datetime, timezone

from askg_spark.extract import extract_mentions, extract_page, visible_text

TS = datetime(2025, 6, 1, tzinfo=timezone.utc)


def _mcpso(body: str) -> bytes:
    return f"<html><head><title>T by A</title></head><body>{body}</body></html>".encode()


def test_mcpso_golden_full():
    html = (b'<html><head><title>Quartz Hub by acme</title>'
            b'<meta name="description" content="A quartz hub connector">'
            b'</head><body><h1>Quartz Hub by acme</h1>'
            b'<p>ignored because meta wins</p>'
            b'<a href="https://github.com/acme/quartz-hub">Repo</a>'
            b'<span class="tag">#tools</span><span class="tag">agent</span>'
            b'<span class="tag">averyverylongtagthatisdropped</span>'
            b'</body></html>')
    url = "https://mcp.so/server/quartz-hub/acme"
    mentions, reason = extract_page(url, html, None)
    assert reason is None and len(mentions) == 1
    m = mentions[0]
    assert m["name"] == "Quartz Hub"
    assert m["author"] == "acme"
    assert m["description"] == "A quartz hub connector"
    assert m["repository"] == "https://github.com/acme/quartz-hub"
    assert m["tags"] == ["tools", "agent"]


def test_mcpso_p_fallback_and_url_segments():
    # no meta -> first <p>; no " by " in title -> url-segment author fallback
    html = (b'<html><head><title>Solo</title></head><body>'
            b'<p>first para wins</p></body></html>')
    url = "https://mcp.so/server/solo-name/someone"
    mentions, reason = extract_page(url, html, None)
    assert reason is None
    m = mentions[0]
    assert m["name"] == "Solo"            # title text, no by-split
    assert m["author"] == "someone"       # url fallback for author only
    assert m["description"] == "first para wins"


def test_github_mcp_predicate_and_fields():
    ok = (b'<html><head><title>o/r</title></head><body><h1>r</h1>'
          b'<p>An MCP server. This is a thing implementation in rust.</p>'
          b'<ul><li>get_data</li><li>write_data</li></ul>'
          b'<span>stars:123</span></body></html>')
    url = "https://github.com/owner/repo"
    mentions, reason = extract_page(url, ok, None)
    assert reason is None
    m = mentions[0]
    assert (m["name"], m["author"]) == ("repo", "owner")
    assert m["repository"] == url
    assert m["implementation_language"] == "rust"
    assert m["popularity_score"] == 123
    assert [t["name"] for t in m["tools"]] == ["get_data", "write_data"]

    bad = ok.replace(b"An MCP server.", b"A general library.")
    mentions, reason = extract_page(url, bad, None)
    assert reason == "not_mcp" and mentions == []


def test_glama_json_explode():
    body = (b'{"servers": [{"name": "s1", "author": "a", "tools": '
            b'[{"name": "get_x", "description": null}], "popularity": 7},'
            b'{"name": null}, {"name": "s2"}]}')
    url = "https://glama.ai/api/mcp/servers?page=1"
    mentions, reason = extract_page(url, body, None)
    assert reason is None
    assert [m["name"] for m in mentions] == ["s1", "s2"]
    assert mentions[0]["popularity_score"] == 7
    assert mentions[0]["tools"] == [{"name": "get_x", "description": None}]


def test_quarantine_rules():
    cases = [
        ("https://mcp.so/server/x/y", None, None, "null_html"),
        ("https://mcp.so/server/x/y", b"<html>tiny</html>", None, "tiny_body"),
        ("https://mcpmarket.com/s/x",
         b"<html><body><p>Checking your browser before access</p>"
         b"</body></html>" + b" " * 40, None, "security_checkpoint"),
        ("https://unknown.example/x", b"<html><body><p>%s</p></body></html>"
         % (b"x" * 80), None, "unknown_family"),
        ("https://glama.ai/api/mcp/servers?page=1",
         b"not json at all " * 10, None, "bad_json"),
    ]
    for url, html, text, want in cases:
        mentions, reason = extract_page(url, html, text)
        assert reason == want and mentions == []


def test_byte_identical_text_invariant():
    html = _mcpso("<p>Some description here that is long enough.</p>")
    url = "https://mcp.so/server/t/a"
    good = visible_text(html.decode())
    mentions, reason = extract_page(url, html, good)
    assert reason is None and mentions
    assert mentions[0]["extracted_text"] == good
    # a text column that disagrees with the recomputation is quarantined
    mentions, reason = extract_page(url, html, good + "tampered")
    assert reason == "text_mismatch" and mentions == []


def test_extract_mentions_split_outputs(spark):
    rows = [
        ("https://mcp.so/server/a/b",
         _mcpso("<p>A fine description of this server.</p>"), TS),
        ("https://mcp.so/server/c/d", b"<html>x</html>", TS),  # tiny
    ]
    pages = spark.createDataFrame(
        [(u, TS, h, visible_text(h.decode()), "en") for u, h, _ in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string")
    mentions, rejects = extract_mentions(pages)
    assert mentions.count() == 1
    rej = rejects.collect()
    assert len(rej) == 1 and rej[0]["reason"] == "tiny_body"


def test_mcpmarket_card_golden():
    # card precedence: server-card divs beat articles; name from first
    # h1/h2/h3 (len >= 2), first <p>, first github link, author from
    # the repo path, first-wins name dedup (scrapers.py:1110-1177)
    html = (b'<html><head><title>MCP Market</title></head><body>'
            b'<div class="server-card x"><h2>Alpha Kit</h2>'
            b'<p>alpha description</p>'
            b'<a href="https://github.com/ak-org/alpha-kit">gh</a></div>'
            b'<div class="server-card"><h3>B</h3><p>too short name ok</p></div>'
            b'<div class="server-card"><h2>Alpha Kit</h2><p>dup name</p></div>'
            b'<article><h2>Ignored Article</h2></article>'
            b'</body></html>')
    url = "https://mcpmarket.com/servers"
    mentions, reason = extract_page(url, html, None)
    assert reason is None
    assert [m["name"] for m in mentions] == ["Alpha Kit", "B"][:len(mentions)]
    m = mentions[0]
    assert m["registry"] == "mcpmarket.com"
    assert m["description"] == "alpha description"
    assert m["repository"] == "https://github.com/ak-org/alpha-kit"
    assert m["author"] == "ak-org"
    # "B" card: single-char names are rejected (len < 2)
    assert all(m["name"] != "B" for m in mentions)
    assert len(mentions) == 1


def test_mcpmarket_article_fallback_and_desc_div():
    # no card/server divs -> article family; description falls back to
    # the .description div when no <p> exists
    html = (b'<html><head><title>MCP Market listing page</title></head>'
            b'<body><article><h2>Beta Scope</h2>'
            b'<div class="description">beta desc</div></article>'
            b'</body></html>')
    mentions, reason = extract_page("https://mcpmarket.com/servers/2",
                                    html, None)
    assert reason is None and len(mentions) == 1
    assert mentions[0]["name"] == "Beta Scope"
    assert mentions[0]["description"] == "beta desc"
    assert mentions[0]["repository"] is None
    assert mentions[0]["author"] is None


def test_mcpmarket_api_json_aliases():
    import json as _json
    body = _json.dumps({"data": [
        {"title": "Gamma Flow", "owner": "gdev",
         "repo_url": "https://github.com/gdev/gamma-flow",
         "description": "gamma desc"},
        {"no_name": True},
    ]}).encode()
    url = "https://mcpmarket.com/api/servers?page=1"
    mentions, reason = extract_page(url, body, None)
    assert reason is None and len(mentions) == 1
    m = mentions[0]
    assert (m["name"], m["author"]) == ("Gamma Flow", "gdev")
    assert m["repository"] == "https://github.com/gdev/gamma-flow"


def test_mcpmarket_no_cards_rejected():
    html = (b'<html><head><title>MCP Market front page, no listings'
            b'</title></head><body><p>welcome text only here</p></body></html>')
    mentions, reason = extract_page("https://mcpmarket.com/about", html, None)
    assert mentions == [] and reason == "no_server_cards"


def test_glama_resources_and_prompts():
    import json as _json
    body = _json.dumps({"servers": [{
        "name": "rp-server", "author": "dev",
        "resources": [
            {"uri": "file:///a", "name": "a", "mime_type": "text/plain"},
            {"no_uri": True},
        ],
        "prompts": [{"name": "p1", "description": "d1"}],
    }]}).encode()
    mentions, reason = extract_page(
        "https://glama.ai/api/mcp/servers?page=0", body, None)
    assert reason is None
    m = mentions[0]
    assert m["resources"] == [{"uri": "file:///a", "name": "a",
                               "description": None,
                               "mime_type": "text/plain"}]
    assert m["prompts"] == [{"name": "p1", "description": "d1"}]


def test_rendered_page_families_text_matches_visible(spark):
    """Every webcorpus render family must satisfy the input_hint
    byte-identity invariant: text == visible_text(html) per url — a
    mismatch would silently reject the whole family as text_mismatch."""
    from askg_spark import webcorpus as W

    docs = spark.createDataFrame(
        [(0, "alpha beta", "en", "srcA", 10),
         (3, "", "de", "srcB", 0),
         (5, None, "fr", "srcC", 0),
         (10, "x & <y> \"z\"", "en", "srcD", 11)],
        "doc_id long, text string, lang string, source string, n_chars long")
    for render in (W.render_pages, W.render_github_pages,
                   W.render_mcpmarket_pages, W.render_fuzzy_pages):
        for r in render(docs).collect():
            got = visible_text(r["html"].decode())
            assert got == r["text"], (render.__name__, r["url"],
                                      got, r["text"])


def test_rendered_github_and_mcpmarket_extract_clean(spark):
    """No rejects from the deterministic github / mcpmarket renders;
    field spot-checks against the closed forms the SQL oracles use."""
    from askg_spark import webcorpus as W

    docs = spark.createDataFrame(
        [(4, "t", "en", "srcA", 1), (5, "t", "en", "srcB", 1)],
        "doc_id long, text string, lang string, source string, n_chars long")
    m, rej = extract_mentions(W.render_github_pages(docs))
    assert rej.count() == 0
    rows = {r["author"]: r for r in m.collect()}
    assert rows["srcA"]["implementation_language"] == "python"
    assert rows["srcA"]["popularity_score"] == 4
    assert len(rows["srcA"]["tools"]) == 2      # even doc_id
    assert len(rows["srcB"]["tools"]) == 1
    m2, rej2 = extract_mentions(W.render_mcpmarket_pages(docs))
    assert rej2.count() == 0
    by_url = {}
    for r in m2.collect():
        by_url.setdefault(r["url"], []).append(r["name"])
    counts = sorted(len(v) for v in by_url.values())
    assert counts == [1, 2]                      # doc 5: first-wins dedup
