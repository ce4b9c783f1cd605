"""Key normalizers P5-P10 as pure Column expressions.

Each function reproduces a reference normalizer regex-for-regex (cited);
these are *key-equality semantics* for the dedup joins, so exactness
matters more than elegance.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_repo_url(url: Column) -> Column:
    """P5: repository-URL normalizer; deduplication.py:164-172.

    lower -> rstrip("/") -> removesuffix(".git") -> netloc+path
    (scheme, query, fragment dropped — urlparse semantics).
    """
    u = F.lower(url)
    u = F.regexp_replace(u, r"/+$", "")
    u = F.regexp_replace(u, r"\.git$", "")
    # strip scheme then cut at first '?' or '#' => netloc+path
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    return u


def norm_name(name: Column) -> Column:
    """P6: name normalizer; deduplication.py:174-187.

    lower -> drop [^a-z0-9\\s] -> collapse spaces/strip ->
    strip leading 'mcp' affix -> strip trailing 'server'/'mcp' affix.
    (After the charset strip no '-'/'_' survive, so the affix regexes
    reduce to space-separated forms — kept identical anyway.)
    """
    n = F.lower(F.coalesce(name, F.lit("")))
    n = F.regexp_replace(n, r"[^a-z0-9\s]", "")
    n = F.trim(F.regexp_replace(n, r"\s+", " "))
    n = F.regexp_replace(n, r"^(mcp[-_\s]*)?", "")
    n = F.regexp_replace(n, r"[-_\s]*(server|mcp)$", "")
    return n


def py_list_repr(arr: Column) -> Column:
    """Render array<string> exactly like Python's str(sorted(list)) —
    needed byte-for-byte by the content hash (deduplication.py:195-196)."""
    sorted_arr = F.array_sort(arr)
    return F.when(F.size(sorted_arr) == 0, F.lit("[]")).otherwise(
        F.concat(F.lit("['"), F.array_join(sorted_arr, "', '"), F.lit("']"))
    )


def content_hash(
    name: Column, author: Column, description: Column,
    categories: Column, operations: Column,
) -> Column:
    """P7: md5 identity hash; deduplication.py:189-200.

    md5(norm_name|norm_author|lower(desc[:200])|str(sorted(cats))|str(sorted(ops)))
    """
    parts = F.concat_ws(
        "|",
        norm_name(name),
        norm_name(F.coalesce(author, F.lit(""))),
        F.lower(F.substring(F.coalesce(description, F.lit("")), 1, 200)),
        py_list_repr(categories),
        py_list_repr(operations),
    )
    return F.md5(parts)


def extract_repository_id(url: Column) -> Column:
    """P9: owner/repo extraction; id_standardization.py:72-108.

    lower -> strip scheme + www. -> if a known git host appears, take
    path segments 1 and 2 (0 = host), strip trailing .git from repo.
    Returns NULL when not extractable.
    """
    u = F.lower(F.coalesce(url, F.lit("")))
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    parts = F.split(u, "/")
    host_hit = F.lit(False)
    for domain in ["github.com", "gitlab.com", "bitbucket.org", "codeberg.org"]:
        host_hit = host_hit | u.contains(domain)
    ok = host_hit & (F.size(parts) >= 3)
    owner = F.element_at(parts, 2)
    repo = F.regexp_replace(F.element_at(parts, 3), r"\.git$", "")
    return F.when(ok, F.concat_ws("/", owner, repo))


def normalize_id(raw: Column) -> Column:
    """P8: global-id normalizer; id_standardization.py:110-136.

    lower -> [_\\s]+ → '-' -> drop [^a-z0-9-/] -> collapse '-' ->
    strip '-' -> if >100 chars: first 80 + '-' + md5(rest)[:8].
    """
    n = F.lower(F.coalesce(raw, F.lit("")))
    n = F.regexp_replace(n, r"[_\s]+", "-")
    n = F.regexp_replace(n, r"[^a-z0-9\-/]", "")
    n = F.regexp_replace(n, r"-+", "-")
    n = F.regexp_replace(n, r"^-+|-+$", "")
    return F.when(
        F.length(n) > 100,
        F.concat(
            F.substring(n, 1, 80), F.lit("-"),
            F.substring(F.md5(F.substring(n, 81, 1000000)), 1, 8),
        ),
    ).otherwise(n)


def content_hash_id(
    name: Column, author: Column, description: Column,
    repository: Column, tool_names: Column,
) -> Column:
    """P10: sha256 fallback id; id_standardization.py:138-155.

    sha256(lower(name)|lower(author)|lower(desc[:100])|lower(repo)[|sorted tool names])
    -> 'server-' + first 12 hex chars. The tools component is appended
    only when the tools list is non-empty (reference: `if tools`).
    """
    base = F.concat_ws(
        "|",
        F.lower(F.coalesce(name, F.lit(""))),
        F.lower(F.coalesce(author, F.lit(""))),
        F.lower(F.substring(F.coalesce(description, F.lit("")), 1, 100)),
        F.lower(F.coalesce(repository, F.lit(""))),
    )
    with_tools = F.concat_ws(
        "|", base, F.array_join(F.array_sort(tool_names), "|")
    )
    content = F.when(
        tool_names.isNotNull() & (F.size(tool_names) > 0), with_tools
    ).otherwise(base)
    return F.concat(F.lit("server-"), F.substring(F.sha2(content, 256), 1, 12))
