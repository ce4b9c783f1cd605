"""Pure-Python mini-reference: single-process KG construction oracle.

An independent reimplementation of the reference's semantics
(/root/reference/src/{deduplication,id_standardization,neo4j_integration}.py,
studied for behavior only) in plain dict/loop Python — the same shape as
the reference itself. The Spark pipeline is tested against this oracle:
triple-set P/R >= 0.95 (BASELINE.json north_rule).

Shares only `askg_spark.extract.extract_page` (a pure function, itself
pinned by golden tests) so both sides observe identical mentions; every
downstream step here (classify, link, canonicalize, ids, relations,
triples) is written independently of the Spark code paths.
"""
from __future__ import annotations

import hashlib
import re
from difflib import SequenceMatcher

from askg_spark.extract import extract_page
from askg_spark.fixtures import _rows_for_server

# --- keyword tables (reference scrapers.py:115-156) ------------------------

CATEGORY_KEYWORDS = [
    ("database", ["database", "sql", "postgres", "mysql", "mongodb", "redis"]),
    ("file_system", ["file", "filesystem", "directory", "folder", "storage"]),
    ("api_integration", ["api", "rest", "graphql", "webhook", "http"]),
    ("development_tools", ["git", "github", "code", "development", "build"]),
    ("data_processing", ["data", "etl", "transform", "process", "analytics"]),
    ("cloud_services", ["aws", "azure", "gcp", "cloud", "kubernetes"]),
    ("communication", ["slack", "discord", "email", "notification", "message"]),
    ("authentication", ["auth", "oauth", "login", "security", "jwt"]),
    ("monitoring", ["monitor", "metrics", "logging", "observability"]),
    ("search", ["search", "index", "elasticsearch", "solr"]),
    ("ai_ml", ["ai", "ml", "machine learning", "neural", "model"]),
]
OPERATION_KEYWORDS = [
    ("read", ["get", "read", "fetch", "list"]),
    ("write", ["create", "write", "update", "delete"]),
    ("query", ["query", "search", "find"]),
    ("execute", ["execute", "run", "call"]),
]


def categorize(name, description):
    text = ((description or "") + " " + (name or "")).lower()
    cats = [c for c, kws in CATEGORY_KEYWORDS if any(k in text for k in kws)]
    return cats or ["other"]


def operations_of(tools):
    ops = []
    for t in tools or []:
        tn = (t.get("name") or "").lower()
        for op, kws in OPERATION_KEYWORDS:
            if any(k in tn for k in kws):
                if op not in ops:
                    ops.append(op)
                break
    return sorted(ops) if ops else ["read"]


# --- normalizers (deduplication.py:164-200, id_standardization.py:72-155) --

def norm_name(name):
    if not name:
        return ""
    n = re.sub(r"[^a-z0-9\s]", "", name.lower())
    n = re.sub(r"\s+", " ", n).strip()
    n = re.sub(r"^(mcp[-_\s]*)?", "", n)
    n = re.sub(r"[-_\s]*(server|mcp)$", "", n)
    return n


def norm_repo_url(url):
    from urllib.parse import urlparse
    u = url.lower().rstrip("/")
    u = u.removesuffix(".git")
    p = urlparse(u)
    return f"{p.netloc}{p.path}"


def content_hash(m):
    parts = [
        norm_name(m["name"]),
        norm_name(m["author"] or ""),
        (m["description"] or "").lower()[:200],
        str(sorted(m["categories"])),
        str(sorted(m["operations"])),
    ]
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def extract_repository_id(url):
    if not url:
        return None
    u = re.sub(r"^https?://", "", str(url).lower())
    u = re.sub(r"^www\.", "", u)
    for domain in ["github.com", "gitlab.com", "bitbucket.org", "codeberg.org"]:
        if domain in u:
            parts = u.split("/")
            if len(parts) >= 3:
                return f"{parts[1]}/{re.sub(r'[.]git$', '', parts[2])}"
    return None


def normalize_id(raw):
    if not raw:
        return ""
    n = re.sub(r"[_\s]+", "-", raw.lower())
    n = re.sub(r"[^a-z0-9\-/]", "", n)
    n = re.sub(r"-+", "-", n).strip("-")
    if len(n) > 100:
        n = n[:80] + "-" + hashlib.md5(n[80:].encode()).hexdigest()[:8]
    return n


def content_hash_id(m):
    comps = [
        (m["name"] or "").lower(), (m["author"] or "").lower(),
        (m["description"] or "")[:100].lower(), (m["repository"] or "").lower(),
    ]
    tool_names = [t["name"] for t in (m["tools"] or [])]
    if tool_names:
        comps.append("|".join(sorted(tool_names)))
    return "server-" + hashlib.sha256("|".join(comps).encode()).hexdigest()[:12]


def completeness(m):
    score = 0
    score += 2 if m["description"] else 0
    score += 1 if m["author"] else 0
    score += 2 if m["repository"] else 0
    score += 1 if m["version"] else 0
    score += 1 if m["license"] else 0
    score += 1 if m["homepage"] else 0
    score += len(m["tools"] or [])
    score += len(m["categories"])
    score += 1 if m["popularity_score"] else 0
    return score


# --- linking (deduplication.py:117-262,375-426) ----------------------------

def _ratio(a, b):
    if a is None or b is None:
        return 0.0
    return SequenceMatcher(None, a, b).ratio()


def _github_org(repo):
    if not repo:
        return None
    parts = str(repo).split("/")
    return parts[3] if len(parts) >= 4 else None


def _composite(a, b):
    comp = 0.0
    if a["author"] and b["author"]:
        comp += _ratio(norm_name(a["author"]), norm_name(b["author"])) * 0.3
    if a["description"] and b["description"]:
        comp += _ratio(a["description"].lower()[:100],
                       b["description"].lower()[:100]) * 0.2
    ca, cb = set(a["categories"]), set(b["categories"])
    if ca and cb:
        comp += (len(ca & cb) / max(len(ca), len(cb))) * 0.2
    la, lb = a["implementation_language"], b["implementation_language"]
    if la and lb and la == lb:
        comp += 0.1
    if _github_org(a["repository"]) and \
            _github_org(a["repository"]) == _github_org(b["repository"]):
        comp += 0.2
    return comp


def _detailed(a, b):
    det = _ratio(norm_name(a["name"]), norm_name(b["name"])) * 0.4
    if a["author"] and b["author"]:
        det += _ratio(norm_name(a["author"]), norm_name(b["author"])) * 0.2
    if a["repository"] and b["repository"]:
        na = str(a["repository"]).split("/")
        nb = str(b["repository"]).split("/")
        if len(na) >= 3 and len(nb) >= 3 and na[2] == nb[2]:
            det += 0.2
    if a["description"] and b["description"]:
        det += _ratio(a["description"].lower(), b["description"].lower()) * 0.1
    ca, cb = set(a["categories"]), set(b["categories"])
    if ca and cb:
        det += (len(ca & cb) / len(ca | cb)) * 0.1
    return det


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id root keeps components deterministic
            lo, hi = sorted([ra, rb])
            self.p[hi] = lo


# --- full oracle pipeline ---------------------------------------------------

def extract_all_mentions(n_servers, seed=42):
    """Same pages the fixture generator emits, driver-side."""
    mentions = []
    for k in range(n_servers):
        for (url, ts, html_b, text, lang) in _rows_for_server(seed, k):
            ms, reason = extract_page(url, html_b, text)
            if reason:
                continue
            for m in ms:
                m = dict(m)
                m["warc_ts"] = ts
                m["categories"] = categorize(m["name"], m["description"])
                m["operations"] = operations_of(m["tools"])
                # \x01 separator matches the engine's collision guard
                m["mention_id"] = hashlib.md5(
                    "\x01".join([m["url"], m["name"] or "",
                                 m["author"] or ""]).encode()).hexdigest()
                mentions.append(m)
    return mentions


def link(mentions):
    uf = UnionFind()
    for key_fn in (
        lambda m: norm_repo_url(m["repository"]) if m["repository"] else None,
        lambda m: (norm_name(m["name"]) + "|" + norm_name(m["author"]))
        if m["name"] and m["author"] else None,
        content_hash,
    ):
        groups = {}
        for m in mentions:
            k = key_fn(m)
            if k:
                groups.setdefault(k, []).append(m["mention_id"])
        for ids in groups.values():
            for other in ids[1:]:
                uf.union(ids[0], other)
    # fuzzy all-pairs (the reference's O(n^2) scan)
    for i, a in enumerate(mentions):
        for b in mentions[i + 1:]:
            na, nb = norm_name(a["name"]), norm_name(b["name"])
            if not na or not nb or na == nb:
                continue
            comp = _composite(a, b)
            similar = comp > 0.7
            if _ratio(na, nb) > 0.85 and similar:
                uf.union(a["mention_id"], b["mention_id"])
            elif (similar and a["registry"] != b["registry"]
                    and _detailed(a, b) > 0.9):
                uf.union(a["mention_id"], b["mention_id"])
    comps = {}
    for m in mentions:
        comps.setdefault(uf.find(m["mention_id"]), []).append(m)
    return comps


def canonicalize(components):
    entities = []
    for members in components.values():
        members = sorted(members, key=lambda m: (-completeness(m), m["url"]))
        ent = {}
        for field in ("name", "author", "description", "repository",
                      "homepage", "license", "version",
                      "implementation_language"):
            ent[field] = next(
                (m[field] for m in members if m[field]), None)
        for field in ("categories", "operations"):
            ent[field] = sorted({v for m in members for v in m[field]})
        for field, key in (("tools", "name"), ("resources", "uri"),
                           ("prompts", "name")):
            items, seen = [], set()
            for m in members:
                for t in (m.get(field) or []):
                    if t[key] not in seen:
                        seen.add(t[key])
                        items.append(t)
            ent[field] = items
        ent["popularity_score"] = max(
            (m["popularity_score"] for m in members
             if m["popularity_score"] is not None), default=None)
        ent["completeness"] = max(completeness(m) for m in members)
        ent["member_urls"] = sorted(m["url"] for m in members)
        entities.append(ent)
    return entities


def assign_ids(entities):
    for e in entities:
        rid = extract_repository_id(e["repository"])
        if rid and normalize_id(rid):
            cand = normalize_id(rid)
        elif e["name"] and e["author"]:
            cand = normalize_id(f"{e['author']}/{e['name']}")
        elif e["name"]:
            cand = normalize_id(e["name"])
        else:
            cand = content_hash_id(e)
        e["candidate_id"] = cand or content_hash_id(e)
    by_cand = {}
    for e in entities:
        by_cand.setdefault(e["candidate_id"], []).append(e)
    for cand, group in by_cand.items():
        group.sort(key=lambda e: (-e["completeness"], e["member_urls"][0]))
        for rank, e in enumerate(group, start=1):
            e["id"] = cand if rank == 1 else f"{cand}-{rank}"
    return entities


def infer_relations(entities):
    """All-pairs nested loop, reference neo4j_integration.py:552-631."""
    edges = set()
    ents = sorted(entities, key=lambda e: e["id"])
    for i, a in enumerate(ents):
        for b in ents[i + 1:]:
            lo, hi = (a, b) if a["id"] < b["id"] else (b, a)
            if a["author"] and a["author"] == b["author"]:
                edges.add((lo["id"], "same_author", hi["id"]))
            common_cats = set(a["categories"]) & set(b["categories"])
            if common_cats:
                edges.add((lo["id"], "similar_functionality", hi["id"]))
                la, lb = a["implementation_language"], b["implementation_language"]
                if la and la == lb:
                    edges.add((lo["id"], "alternative_to", hi["id"]))
            if len(set(a["operations"]) & set(b["operations"])) >= 2:
                edges.add((lo["id"], "complementary", hi["id"]))
    return edges


def triples_of(entities, rel_edges):
    triples = set(rel_edges)
    for e in entities:
        for c in e["categories"]:
            triples.add((e["id"], "HAS_CATEGORY", c))
        for o in e["operations"]:
            triples.add((e["id"], "HAS_OPERATION", o))
        for t in e["tools"]:
            triples.add((e["id"], "HAS_TOOL", t["name"]))
        for r in e["resources"]:
            triples.add((e["id"], "HAS_RESOURCE", r["uri"]))
        for p in e["prompts"]:
            triples.add((e["id"], "HAS_PROMPT", p["name"]))
        if e["author"]:
            triples.add((e["id"], "AUTHORED_BY", e["author"]))
    # NO HAS_SUBCATEGORY rows: the reference's predefined categories
    # set no parent_category_id (main.py create_ontology_categories),
    # so its default build emits zero hierarchy edges — build_triples
    # mirrors that default (hierarchy is opt-in).
    return triples


def oracle_triples(n_servers, seed=42):
    mentions = extract_all_mentions(n_servers, seed)
    entities = assign_ids(canonicalize(link(mentions)))
    rels = infer_relations(entities)
    return triples_of(entities, rels), entities
