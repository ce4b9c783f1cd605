"""Extraction stage: pages(url, warc_ts, html, text, lang) -> mentions + rejects.

Re-expresses the reference's per-page parse as an Arrow-batched
``mapInPandas`` stage (SURVEY §2.2 P4, §2.9). Semantics reproduced:

  * mcp.so detail parse      /root/reference/src/scrapers.py:611-690
    (h1-else-title, " by " split, meta-description else first <p>,
     first github.com link, tag/label/badge spans with '#' strip and
     len<20 rule, url-segment fallback for missing name/author)
  * MCP-indicator predicate  scrapers.py:309-337 (applied to github pages)
  * glama JSON servers[]     scrapers.py:832-871 (JSON body -> explode),
    plus resources[]/prompts[] sub-entities when present
    (models.py:47-57 — the scrapers never populate them, but the node
    sink models them; the JSON API is their natural carrier)
  * mcpmarket server cards   scrapers.py:1110-1177 (card containers in
    class precedence server-card > server > article > card; name from
    first h1/h2/h3 with len >= 2, first <p> else .description div,
    first github link, author = repo path segment, per-page first-wins
    name dedup) and API JSON  scrapers.py:1179-1233 (list under
    servers/data/items/results or top-level; name|title, author|owner,
    repository|repo_url aliases)
  * security-checkpoint / tiny-body quality gates  scrapers.py:1065-1069

Contract (BASELINE.json input_hint): the recomputed visible text must be
byte-identical to the `text` column per url — enforced here, mismatches
quarantined, never silently passed through.

The parser is a small deterministic regex HTML reader (no external HTML
lib in this environment); it is pinned by golden tests in
tests/test_extract.py so drift breaks the build, not the data.
"""

from __future__ import annotations

import html as html_mod
import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from askg_spark import schemas
from askg_spark.ontology import MCP_INDICATORS

_RE_TAGBLOCK = re.compile(r"(?s)<(script|style)\b.*?</\1>")
_RE_TAG = re.compile(r"<[^>]+>")
_RE_H1 = re.compile(r"(?s)<h1[^>]*>(.*?)</h1>")
_RE_TITLE = re.compile(r"(?s)<title[^>]*>(.*?)</title>")
_RE_META_DESC = re.compile(
    r'<meta\s[^>]*name="description"[^>]*content="([^"]*)"')
_RE_P = re.compile(r"(?s)<p[^>]*>(.*?)</p>")
_RE_GH_LINK = re.compile(r'<a\s[^>]*href="([^"]*github\.com[^"]*)"')
_RE_TAGSPAN = re.compile(
    r'(?s)<(?:span|div)\s[^>]*class="[^"]*(?:tag|label|badge)[^"]*"[^>]*>(.*?)</(?:span|div)>')
_RE_LI = re.compile(r"(?s)<li[^>]*>(.*?)</li>")
_RE_STARS = re.compile(r"stars:(\d+)")
_RE_IMPL = re.compile(r"implementation in ([a-z]+)\.")

SECURITY_MARKERS = ["checking your browser", "security checkpoint",
                    "access denied", "captcha"]
MIN_HTML_BYTES = 60


def visible_text(html_str: str) -> str:
    """Canonical visible-text rule: drop script/style, strip tags,
    strip each text node, drop empties, join with newlines."""
    s = _RE_TAGBLOCK.sub("", html_str)
    parts = _RE_TAG.split(s)
    out = [html_mod.unescape(p).strip() for p in parts]
    return "\n".join(p for p in out if p)


def _text_of(m: re.Match | None) -> str | None:
    if not m:
        return None
    return html_mod.unescape(_RE_TAG.sub("", m.group(1))).strip() or None


def _registry_of(url: str) -> str | None:
    if "mcp.so/server/" in url:
        return "mcp.so"
    if url.startswith("https://github.com/") or url.startswith("http://github.com/"):
        return "github"
    if "glama.ai/api" in url:
        return "glama"
    if "mcpmarket.com" in url:
        return "mcpmarket.com"
    return None


def _empty_mention(url: str, registry: str) -> dict:
    return {
        "url": url, "registry": registry, "name": None, "author": None,
        "description": None, "repository": None, "homepage": None,
        "license": None, "version": None, "implementation_language": None,
        "tools": None, "resources": None, "prompts": None, "tags": None,
        "popularity_score": None, "download_count": None,
    }


def _parse_mcpso(url: str, html_str: str) -> tuple[list[dict], str | None]:
    m = _empty_mention(url, "mcp.so")
    # h1 else title; " by " split (maxsplit=1)   [scrapers.py:629-635]
    title_text = _text_of(_RE_H1.search(html_str)) or _text_of(
        _RE_TITLE.search(html_str))
    if title_text:
        if " by " in title_text:
            m["name"], m["author"] = title_text.split(" by ", 1)
        else:
            m["name"] = title_text
    # meta description else first <p>            [scrapers.py:637-644]
    meta = _RE_META_DESC.search(html_str)
    if meta:
        m["description"] = html_mod.unescape(meta.group(1)) or None
    else:
        m["description"] = _text_of(_RE_P.search(html_str))
    # first github.com link                      [scrapers.py:647-649]
    gh = _RE_GH_LINK.search(html_str)
    if gh:
        m["repository"] = gh.group(1)
    # tags: '#x' -> 'x'; else keep if len<20     [scrapers.py:652-658]
    tags = []
    for tm in _RE_TAGSPAN.finditer(html_str):
        t = html_mod.unescape(_RE_TAG.sub("", tm.group(1))).strip()
        if t.startswith("#"):
            tags.append(t[1:])
        elif len(t) < 20:
            tags.append(t)
    m["tags"] = tags or None
    # url-segment fallback                       [scrapers.py:662-667]
    if not m["name"] or not m["author"]:
        url_parts = url.split("/")
        if len(url_parts) >= 6:
            if not m["name"]:
                m["name"] = url_parts[-2]
            if not m["author"]:
                m["author"] = url_parts[-1]
    if not m["name"]:
        return [], "no_name"
    return [m], None


def _parse_github(url: str, html_str: str, page_text: str) -> tuple[list[dict], str | None]:
    low = page_text.lower()
    if not any(ind in low for ind in MCP_INDICATORS):
        return [], "not_mcp"                    # P1 filter [scrapers.py:309-337]
    parts = url.rstrip("/").split("/")
    if len(parts) < 5:
        return [], "bad_github_url"
    owner, repo = parts[-2], parts[-1]
    m = _empty_mention(url, "github")
    m["name"], m["author"] = repo, owner
    m["repository"] = url
    m["description"] = _text_of(_RE_P.search(html_str))
    impl = _RE_IMPL.search(low)
    if impl:
        m["implementation_language"] = impl.group(1)
    stars = _RE_STARS.search(html_str)
    if stars:
        m["popularity_score"] = int(stars.group(1))
    tools = [{"name": t, "description": None}
             for t in (_text_of(x) for x in _RE_LI.finditer(html_str)) if t]
    m["tools"] = tools or None
    return [m], None


def _parse_glama(url: str, body: str) -> tuple[list[dict], str | None]:
    try:
        doc = json.loads(body)
    except (ValueError, TypeError):
        return [], "bad_json"
    out = []
    for s in doc.get("servers", []):
        if not isinstance(s, dict) or not s.get("name"):
            continue
        m = _empty_mention(url, "glama")
        m["name"] = s.get("name")
        m["author"] = s.get("author")
        m["description"] = s.get("description")
        m["repository"] = s.get("repository")
        m["implementation_language"] = s.get("language")
        pop = s.get("popularity")
        m["popularity_score"] = int(pop) if pop is not None else None
        tools = s.get("tools") or []
        m["tools"] = [
            {"name": str(t.get("name")), "description": t.get("description")}
            for t in tools if isinstance(t, dict) and t.get("name")
        ] or None
        # MCPResource / MCPPrompt sub-entities (models.py:47-57); uri is
        # the resource identity key, name the prompt's
        m["resources"] = [
            {"uri": str(r.get("uri")), "name": r.get("name"),
             "description": r.get("description"),
             "mime_type": r.get("mime_type")}
            for r in (s.get("resources") or [])
            if isinstance(r, dict) and r.get("uri")
        ] or None
        m["prompts"] = [
            {"name": str(p.get("name")), "description": p.get("description")}
            for p in (s.get("prompts") or [])
            if isinstance(p, dict) and p.get("name")
        ] or None
        out.append(m)
    if not out:
        return [], "no_servers_in_json"
    return out, None


_RE_CARD_PATS = [
    # class-token semantics of the reference's bs4 find_all(class_=...),
    # in its precedence order (scrapers.py:1117-1122)
    re.compile(r'(?s)<div\s[^>]*class="(?:[^"]*\s)?server-card(?:\s[^"]*)?"'
               r'[^>]*>(.*?)</div>'),
    re.compile(r'(?s)<div\s[^>]*class="(?:[^"]*\s)?server(?:\s[^"]*)?"'
               r'[^>]*>(.*?)</div>'),
    re.compile(r"(?s)<article[^>]*>(.*?)</article>"),
    re.compile(r'(?s)<div\s[^>]*class="(?:[^"]*\s)?card(?:\s[^"]*)?"'
               r'[^>]*>(.*?)</div>'),
]
_RE_H123 = re.compile(r"(?s)<h[123][^>]*>(.*?)</h[123]>")
_RE_DESC_DIV = re.compile(
    r'(?s)<div\s[^>]*class="(?:[^"]*\s)?description(?:\s[^"]*)?"[^>]*>(.*?)</div>')


def _parse_mcpmarket_html(url: str, html_str: str) -> tuple[list[dict], str | None]:
    """Server-card listing parse (scrapers.py:1110-1177): first class
    family with matches wins; per card h1/h2/h3 name (len >= 2), first
    <p> else .description div, first github link, author from the repo
    path; first-wins name dedup within the page."""
    blocks: list[str] = []
    for pat in _RE_CARD_PATS:
        blocks = pat.findall(html_str)
        if blocks:
            break
    out, seen = [], set()
    for block in blocks:
        name = _text_of(_RE_H123.search(block))
        if not name or len(name) < 2 or name in seen:
            continue
        m = _empty_mention(url, "mcpmarket.com")
        m["name"] = name
        m["description"] = _text_of(_RE_P.search(block)) or _text_of(
            _RE_DESC_DIV.search(block))
        gh = _RE_GH_LINK.search(block)
        if gh:
            m["repository"] = gh.group(1)
            parts = m["repository"].split("/")
            if len(parts) >= 5:
                m["author"] = parts[3]       # scrapers.py:1161-1165
        seen.add(name)
        out.append(m)
    if not out:
        return [], "no_server_cards"
    return out, None


def _parse_mcpmarket_api(url: str, body: str) -> tuple[list[dict], str | None]:
    """API-JSON form (scrapers.py:1179-1233): server list under
    servers/data/items/results (or a top-level list); key aliases
    name|title, author|owner, repository|repo_url."""
    try:
        doc = json.loads(body)
    except (ValueError, TypeError):
        return [], "bad_json"
    server_list = None
    if isinstance(doc, dict):
        for key in ["servers", "data", "items", "results"]:
            if isinstance(doc.get(key), list):
                server_list = doc[key]
                break
    elif isinstance(doc, list):
        server_list = doc
    out = []
    for s in server_list or []:
        if not isinstance(s, dict):
            continue
        name = s.get("name") or s.get("title")
        if not name:
            continue
        m = _empty_mention(url, "mcpmarket.com")
        m["name"] = str(name)
        m["author"] = s.get("author") or s.get("owner")
        m["repository"] = s.get("repository") or s.get("repo_url")
        m["description"] = s.get("description")
        out.append(m)
    if not out:
        return [], "no_servers_in_json"
    return out, None


def extract_page(url: str, html_bytes: bytes | None, text: str | None):
    """(mentions, reject_reason) for one page. Pure function — shared by
    the Spark stage and the test oracle."""
    if html_bytes is None:
        return [], "null_html"
    html_str = html_bytes.decode("utf-8", errors="replace")
    if len(html_str) < MIN_HTML_BYTES:
        return [], "tiny_body"
    low = html_str.lower()
    if any(mark in low for mark in SECURITY_MARKERS):
        return [], "security_checkpoint"
    registry = _registry_of(url)
    if registry is None:
        return [], "unknown_family"
    recomputed = body_text = None
    if registry == "glama":
        body_text = html_str
        mentions, reason = _parse_glama(url, html_str)
    elif registry == "mcpmarket.com" and ("/api/" in url
                                          or url.endswith(".json")):
        body_text = html_str
        mentions, reason = _parse_mcpmarket_api(url, html_str)
    else:
        recomputed = visible_text(html_str)
        if text is not None and recomputed != text:
            return [], "text_mismatch"   # byte-identical-text invariant
        if registry == "github":
            mentions, reason = _parse_github(url, html_str, recomputed)
        elif registry == "mcp.so":
            mentions, reason = _parse_mcpso(url, html_str)
        elif registry == "mcpmarket.com":
            mentions, reason = _parse_mcpmarket_html(url, html_str)
        else:
            return [], "unsupported_registry"
    if reason:
        return [], reason
    extracted = recomputed if recomputed is not None else body_text
    for m in mentions:
        m["extracted_text"] = extracted
    return mentions, None


def extract_mentions(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """pages -> (mentions, rejects). Column-pruned scan: only url,
    warc_ts, html, text reach the Python workers; downstream stages never
    see `html` again (SURVEY §4: never deserialize html where text suffices).
    """
    out_schema = (
        "url string, warc_ts timestamp, registry string, name string, "
        "author string, description string, repository string, "
        "homepage string, license string, version string, "
        "implementation_language string, "
        "tools array<struct<name:string,description:string>>, "
        "resources array<struct<uri:string,name:string,description:string,"
        "mime_type:string>>, "
        "prompts array<struct<name:string,description:string>>, "
        "tags array<string>, popularity_score long, download_count long, "
        "reject_reason string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schemas.MENTIONS.fields] + ["reject_reason"]
        for pdf in batches:
            rows = []
            for url, ts, html_b, text in zip(
                    pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"]):
                mentions, reason = extract_page(url, html_b, text)
                if reason:
                    rej = dict.fromkeys(cols)
                    rej.update(url=url, warc_ts=ts, reject_reason=reason)
                    rows.append(rej)
                for m in mentions:
                    full = dict.fromkeys(cols)
                    full.update(m, warc_ts=ts)
                    rows.append(full)
            pdf_out = pd.DataFrame(rows, columns=cols)
            # keep missing values as None (never NaN) so Arrow maps them
            # to nulls for array/struct/long columns alike
            yield pdf_out.astype(object).where(pd.notnull(pdf_out), None)

    raw = pages.select("url", "warc_ts", "html", "text").mapInPandas(
        run, schema=out_schema)
    mentions = raw.filter(F.col("reject_reason").isNull()).drop("reject_reason")
    rejects = raw.filter(F.col("reject_reason").isNotNull()).select(
        "url", "warc_ts",
        F.lit(None).cast("string").alias("registry"),
        F.col("reject_reason").alias("reason"),
    )
    return mentions, rejects
