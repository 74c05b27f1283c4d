"""Deterministic synthetic source-code corpus (FIXTURES.md §F1).

Generates a Parquet table with exactly the north-rule input shape
(repo, path, commit, lang, content) and — because every mention is planted —
the *closed-form expected triple set*, which is the oracle for the
extractor's P/R ≥ 0.95 gate.

Everything is a pure function of (seed, i): no RNG state leaks, so any
worker can regenerate any slice independently.  Edge cases included per
FIXTURES.md: empty files, files without mentions, duplicate content across
repos (dedup exercise), unicode identifiers, a skewed hot repo (~25% of
files) to exercise salting.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

LANGS = ("python", "python", "python", "js", "java")  # skew toward python

_CLASS_NAMES = ("Loader", "Parser", "Writer", "Index", "Cache", "Gráfo", "Ünit")
_FUNC_NAMES = ("load", "parse", "write", "flush", "merge", "scan", "emit")
_CALL_NAMES = ("helper", "compute", "validate", "transform", "log_it")

_EXT = {"python": ".py", "js": ".js", "java": ".java"}


def _h(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _commit_for(repo: str, seed: int) -> str:
    return hashlib.sha1(f"{seed}:{repo}".encode()).hexdigest()


def _base_spec(seed: int, i: int) -> dict:
    """Deterministic spec of file #i before duplicate-content substitution."""
    r = _h(f"{seed}:{i}")
    if r % 4 == 0:
        repo = "org0000/megarepo"  # hot repo: ~25% of all files
    else:
        repo = f"org{(r >> 8) % 40:04d}/repo{(r >> 16) % 200:04d}"
    lang = LANGS[(r >> 24) % len(LANGS)]
    module = f"pkg{(r >> 32) % 10}.mod_{i}"
    spec = {
        "repo": repo,
        "lang": lang,
        "module": module,
        "classes": [],
        "functions": [],
        "imports": [],
        "calls": [],
        "empty": False,
    }
    kind = r % 17
    if kind == 0:
        spec["empty"] = True
    elif kind != 1:  # kind 1 = comment-only file, no mentions
        spec["classes"] = [
            _CLASS_NAMES[(r >> j) % len(_CLASS_NAMES)] for j in range(1 + r % 3)
        ]
        spec["functions"] = [
            _FUNC_NAMES[(r >> j) % len(_FUNC_NAMES)] for j in range(1 + (r >> 3) % 4)
        ]
        spec["imports"] = [
            f"pkg{(r >> (8 + 4 * j)) % 10}.mod_{(r >> (12 + 4 * j)) % max(i, 1)}"
            for j in range(r % 4)
        ]
        spec["calls"] = [
            _CALL_NAMES[(r >> (5 * j)) % len(_CALL_NAMES)] for j in range((r >> 7) % 3)
        ]
        for k in ("classes", "functions", "imports", "calls"):
            seen, out = set(), []
            for v in spec[k]:
                if v not in seen:
                    seen.add(v)
                    out.append(v)
            spec[k] = out
    return spec


def _render(spec: dict) -> str:
    """Render source text containing exactly the planted mentions."""
    if spec["empty"]:
        return ""
    lang = spec["lang"]
    lines: list[str] = []
    if lang == "python":
        lines.append(f'"""Module {spec["module"]}."""')
        for m in spec["imports"]:
            lines.append(f"import {m}")
        for c in spec["classes"]:
            lines.append(f"class {c}:")
            lines.append("    pass")
        for f in spec["functions"]:
            lines.append(f"def {f}(x):")
            if spec["calls"]:
                for call in spec["calls"]:
                    lines.append(f"    {call}(x)")
            else:
                lines.append("    return x")
    elif lang == "js":
        lines.append(f"// module {spec['module']}")
        for m in spec["imports"]:
            lines.append(f"const {m.split('.')[-1]} = require('{m}');")
        for c in spec["classes"]:
            lines.append(f"class {c} {{}}")
        for f in spec["functions"]:
            lines.append(f"function {f}(x) {{")
            for call in spec["calls"]:
                lines.append(f"  {call}(x);")
            lines.append("}")
    else:  # java: classes + imports only
        lines.append(f"// module {spec['module']}")
        for m in spec["imports"]:
            lines.append(f"import {m};")
        for c in spec["classes"]:
            lines.append(f"public class {c} {{ }}")
    return "\n".join(lines) + "\n"


def _effective_spec(seed: int, i: int) -> dict:
    """Final row spec: every ~13th file clones the content (and therefore
    mentions + lang) of the most recent original file, but keeps its own
    repo/path/module identity — an exact duplicate across repos."""
    spec = _base_spec(seed, i)
    if i % 13 == 12:
        for j in range(i - 1, -1, -1):
            if j % 13 == 12:
                continue
            prev = _base_spec(seed, j)
            if not prev["empty"]:
                spec = dict(
                    prev,
                    repo=spec["repo"],
                    module=spec["module"],
                    cloned_module=prev["module"],
                )
                break
    return spec


def _row_path(spec: dict) -> str:
    return "src/" + spec["module"].replace(".", "/") + _EXT[spec["lang"]]


def _row_content(spec: dict) -> str:
    # duplicated files render with the ORIGINAL module's header so the bytes
    # are identical across repos (true content dup)
    if "cloned_module" in spec:
        return _render(dict(spec, module=spec["cloned_module"]))
    return _render(spec)


def generate_rows(seed: int, n_files: int):
    for i in range(n_files):
        spec = _effective_spec(seed, i)
        yield {
            "repo": spec["repo"],
            "path": _row_path(spec),
            "commit": _commit_for(spec["repo"], seed),
            "lang": spec["lang"],
            "content": _row_content(spec),
        }


def corpus_table(seed: int = 7, n_files: int = 200) -> pa.Table:
    return pa.Table.from_pylist(list(generate_rows(seed, n_files)))


def write_corpus_parquet(path: str, seed: int = 7, n_files: int = 200) -> str:
    import pyarrow.parquet as pq

    # small row groups so parallel readers can split the file (a single row
    # group would serialize the whole read into one task)
    pq.write_table(corpus_table(seed, n_files), path, row_group_size=8192)
    return path


def corpus_slice_table(seed: int, start: int, end: int) -> pa.Table:
    """Rows [start, end) — every row is a pure function of (seed, i), so any
    worker can generate any slice independently (used for parallel gen)."""
    return pa.Table.from_pylist(
        [
            {
                "repo": s["repo"],
                "path": _row_path(s),
                "commit": _commit_for(s["repo"], seed),
                "lang": s["lang"],
                "content": _row_content(s),
            }
            for i in range(start, end)
            for s in (_effective_spec(seed, i),)
        ]
    )


def write_corpus_parquet_ray(out_dir: str, seed: int = 7, n_files: int = 10000,
                             rows_per_task: int = 30000) -> str:
    """Parallel corpus generation: Ray tasks each write one parquet shard.

    Deterministic (same seed+n → same bytes per shard) and embarrassingly
    parallel; used by bench for multi-million-file corpora.
    """
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def gen(start: int, end: int, idx: int) -> str:
        import pyarrow.parquet as pq

        p = os.path.join(out_dir, f"part-{idx:05d}.parquet")
        if not os.path.exists(p):
            pq.write_table(corpus_slice_table(seed, start, end), p, row_group_size=8192)
        return p

    refs = []
    for idx, start in enumerate(range(0, n_files, rows_per_task)):
        refs.append(gen.remote(start, min(start + rows_per_task, n_files), idx))
    ray.get(refs)
    return out_dir


def expected_triples(seed: int, n_files: int) -> set[tuple]:
    """Closed-form expected (s, p, o) set — the extractor P/R oracle.

    Object terms are IRI strings; 'unlinked:NAME' marks pre-linking mention
    objects (the linker canonicalizes them; see stages/link.py).
    """
    from ..stages.extract import ONT, RDF_TYPE, module_iri, repo_iri, sym_iri

    out: set[tuple] = set()
    for i in range(n_files):
        spec = _effective_spec(seed, i)
        if spec["empty"]:
            continue
        repo = spec["repo"]
        if spec["lang"] == "java":  # java rules: classes + imports only
            spec = dict(spec, functions=[], calls=[])
        mod = module_iri(repo, _row_path(spec))
        out.add((mod, RDF_TYPE, ONT + "Module"))
        out.add((mod, ONT + "definedIn", repo_iri(repo)))
        for c in spec["classes"]:
            ci = sym_iri(repo, _row_path(spec), c)
            out.add((ci, RDF_TYPE, ONT + "Class"))
            out.add((ci, ONT + "memberOf", mod))
        for f in spec["functions"]:
            fi = sym_iri(repo, _row_path(spec), f)
            out.add((fi, RDF_TYPE, ONT + "Function"))
            out.add((fi, ONT + "memberOf", mod))
        for m in spec["imports"]:
            out.add((mod, ONT + "imports", "unlinked:" + m))
        for call in spec["calls"]:
            out.add((mod, ONT + "calls", "unlinked:" + call))
    return out
