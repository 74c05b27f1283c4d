"""Triple extraction: source-code batches → flattened RDF statement batches.

Ray mapping (SURVEY.md §2.2 "(target) triple extractor"): a stateless
``map_batches(TripleExtractor, batch_format="pyarrow")`` stage.  One input
row (a file) fans out to N statement rows — flat_map semantics expressed by
returning a longer Arrow batch.  Regexes are compiled once per process (in
``__init__`` when used as a callable-class actor stage), and each file is
scanned with C-level ``findall`` — no per-token Python loops.

The sha256 invariant column (BASELINE.json input_hint) is computed in
:func:`ingest_sha256` at read time and carried on every emitted triple row
(``content_sha256``), so every later stage can assert per-row equality.

IRI scheme is chosen so Jelly prefix-lookup compression bites: all symbol
IRIs share per-repo prefixes split at the rightmost '/'.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import quote

import pyarrow as pa

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
ONT = "https://codekg.dev/ont#"
BASE = "https://codekg.dev"

from ..terms import KIND_IRI, KIND_LITERAL  # noqa: E402
from ..schema import KG_TRIPLE_SCHEMA  # noqa: E402


#: characters that pass `quote(s, safe="/._-")` unchanged (RFC 3986
#: unreserved + the explicit safe set); identifiers and repo/module names
#: are almost always clean, so the regex fast path skips urllib entirely
#: (profiled: quote() was 36% of the extract stage)
_Q_CLEAN = re.compile(r'[A-Za-z0-9/._~-]*\Z').match


def _q(s: str) -> str:
    if _Q_CLEAN(s):
        return s
    return quote(s, safe="/._-")


def repo_iri(repo: str) -> str:
    return f"{BASE}/repo/{_q(repo)}"


def file_iri(repo: str, path: str) -> str:
    return f"{BASE}/file/{_q(repo)}/{_q(path)}"


def module_name_from_path(path: str) -> str:
    p = path
    if p.startswith("src/"):
        p = p[4:]
    dot = p.rfind(".")
    if dot > 0:
        p = p[:dot]
    return p.replace("/", ".")


def module_iri(repo: str, path: str) -> str:
    return f"{BASE}/sym/{_q(repo)}/{_q(module_name_from_path(path))}"


def sym_iri(repo: str, path: str, name: str) -> str:
    return f"{BASE}/sym/{_q(repo)}/{_q(module_name_from_path(path))}.{_q(name)}"


# per-language mention rules: (class_re, function_re, import_res, call_stopwords)
_PY_KEYWORDS = {
    "if", "elif", "while", "for", "return", "yield", "print", "def", "class",
    "super", "range", "len", "str", "int", "float", "list", "dict", "set",
    "tuple", "isinstance", "type", "not", "and", "or", "in", "is", "lambda",
    "with", "assert", "raise", "except", "open",
}
_JS_KEYWORDS = {
    "if", "while", "for", "return", "function", "require", "switch", "catch",
    "console", "log", "typeof", "new",
}


class _LangRules:
    __slots__ = ("class_re", "func_re", "import_res", "call_re", "stop")

    def __init__(self, class_re, func_re, import_res, call_re, stop):
        self.class_re = re.compile(class_re, re.M) if class_re else None
        self.func_re = re.compile(func_re, re.M) if func_re else None
        self.import_res = [re.compile(r, re.M) for r in import_res]
        self.call_re = re.compile(call_re, re.M) if call_re else None
        self.stop = stop


def build_rules() -> dict[str, _LangRules]:
    return {
        "python": _LangRules(
            r"^\s*class\s+([^\W\d]\w*)",
            r"^\s*(?:async\s+)?def\s+([^\W\d]\w*)",
            [r"^\s*import\s+([\w\.]+)", r"^\s*from\s+([\w\.]+)\s+import\b"],
            r"(?<![\w.])(?!def\s|class\s)([^\W\d]\w*)\s*\(",
            _PY_KEYWORDS,
        ),
        "js": _LangRules(
            r"^\s*class\s+([^\W\d]\w*)",
            r"\bfunction\s+([^\W\d]\w*)",
            [r"require\(['\"]([^'\"]+)['\"]\)", r"^import\s+.*?from\s+['\"]([^'\"]+)['\"]"],
            r"(?<![\w.])([^\W\d]\w*)\s*\(",
            _JS_KEYWORDS,
        ),
        "java": _LangRules(
            r"\bclass\s+([^\W\d]\w*)",
            None,
            [r"^\s*import\s+([\w\.]+)\s*;"],
            None,
            set(),
        ),
        # extensibility rows (no planted corpus coverage yet — unit-tested on
        # hand-written snippets): struct/trait ≈ class, fn/func ≈ function
        "go": _LangRules(
            r"^\s*type\s+([^\W\d]\w*)\s+struct\b",
            r"^\s*func\s+(?:\([^)]*\)\s*)?([^\W\d]\w*)\s*\(",
            [r"^\s*import\s+\"([\w\./-]+)\"", r"^\s+\"([\w\./-]+)\"$"],
            None,
            set(),
        ),
        "rust": _LangRules(
            r"^\s*(?:pub\s+)?(?:struct|trait|enum)\s+([^\W\d]\w*)",
            r"^\s*(?:pub\s+)?(?:async\s+)?fn\s+([^\W\d]\w*)",
            [r"^\s*use\s+([\w:]+)"],
            None,
            set(),
        ),
    }


def ingest_sha256(batch: pa.Table) -> pa.Table:
    """Add the content_sha256 invariant column at read time."""
    content = batch.column("content")
    hashes = [
        hashlib.sha256(
            (content[i].as_py() or "").encode("utf-8", "surrogatepass")
        ).hexdigest()
        for i in range(len(content))
    ]
    return batch.append_column("content_sha256", pa.array(hashes, pa.string()))


class TripleExtractor:
    """Callable-class for ``map_batches``: code files → KG triple rows.

    Stateful setup (regex compilation) happens once per actor/process in
    ``__init__``; ``__call__`` handles one zero-copy Arrow batch.
    """

    def __init__(self) -> None:
        self.rules = build_rules()

    def _mentions(self, lang: str, text: str):
        rules = self.rules.get(lang)
        if rules is None or not text:
            return (), (), (), ()
        classes = _dedup(rules.class_re.findall(text)) if rules.class_re else ()
        functions = _dedup(rules.func_re.findall(text)) if rules.func_re else ()
        imports: list[str] = []
        for rx in rules.import_res:
            imports.extend(rx.findall(text))
        imports = _dedup(imports)
        calls: tuple[str, ...] = ()
        if rules.call_re is not None:
            defined = set(functions) | set(classes)
            calls = _dedup(
                name
                for name in rules.call_re.findall(text)
                if name not in rules.stop and name not in defined
            )
        return classes, functions, imports, calls

    def __call__(self, batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        langs = batch.column("lang").to_pylist()
        contents = batch.column("content").to_pylist()
        shas = batch.column("content_sha256").to_pylist()

        # emit order per file (seq follows it): module(2) → classes(2 each)
        # → functions(2 each) → imports → calls.  Bulk list extends instead
        # of a per-triple closure (the emit() call was ~30% of this stage);
        # every o is an IRI and o_lex is always null, so those columns are
        # constants.
        P_TYPE, P_DEF = RDF_TYPE, ONT + "definedIn"
        P_MEM, P_IMP, P_CALL = ONT + "memberOf", ONT + "imports", ONT + "calls"
        O_MOD, O_CLS, O_FUN = ONT + "Module", ONT + "Class", ONT + "Function"

        s_vals: list[str] = []
        p_vals: list[str] = []
        o_vals: list[str] = []
        out_repo: list[str] = []
        out_path: list[str] = []
        out_seq: list[int] = []
        out_sha: list[str] = []

        for repo, path, lang, content, sha in zip(repos, paths, langs, contents, shas):
            if not content:
                continue  # empty file: no module triple (nothing defined)
            mod = module_iri(repo, path)
            sym_base = mod + "."  # == sym_iri(repo, path, name) prefix
            classes, functions, imports, calls = self._mentions(lang, content)
            ci = [sym_base + _q(c) for c in classes]
            fi = [sym_base + _q(f) for f in functions]
            ne = 2 + 2 * len(ci) + 2 * len(fi) + len(imports) + len(calls)
            s_vals += (mod, mod)
            s_vals += [x for c in ci for x in (c, c)]
            s_vals += [x for f in fi for x in (f, f)]
            s_vals += [mod] * (len(imports) + len(calls))
            p_vals += (P_TYPE, P_DEF)
            p_vals += (P_TYPE, P_MEM) * len(ci)
            p_vals += (P_TYPE, P_MEM) * len(fi)
            p_vals += [P_IMP] * len(imports)
            p_vals += [P_CALL] * len(calls)
            o_vals += (O_MOD, repo_iri(repo))
            o_vals += (O_CLS, mod) * len(ci)
            o_vals += (O_FUN, mod) * len(fi)
            o_vals += ["unlinked:" + m for m in imports]
            o_vals += ["unlinked:" + c for c in calls]
            out_repo += [repo] * ne
            out_path += [path] * ne
            out_seq += range(ne)
            out_sha += [sha] * ne

        n = len(s_vals)
        return pa.table(
            {
                "s_kind": pa.array([KIND_IRI] * n, pa.uint8()),
                "s_value": pa.array(s_vals, pa.string()),
                "p_kind": pa.array([KIND_IRI] * n, pa.uint8()),
                "p_value": pa.array(p_vals, pa.string()),
                "o_kind": pa.array([KIND_IRI] * n, pa.uint8()),
                "o_value": pa.array(o_vals, pa.string()),
                "o_lex": pa.array([None] * n, pa.string()),
                "o_lang": pa.array([None] * n, pa.string()),
                "o_dt": pa.array([None] * n, pa.string()),
                "repo": pa.array(out_repo, pa.string()),
                "path": pa.array(out_path, pa.string()),
                "seq": pa.array(out_seq, pa.int32()),
                "content_sha256": pa.array(out_sha, pa.string()),
            },
            schema=KG_TRIPLE_SCHEMA,
        )


_EXTRACTOR: TripleExtractor | None = None


def extract_batch(batch: pa.Table) -> pa.Table:
    """Plain-function variant for stateless task-based map_batches.

    Rules are compiled once per worker process (module-level cache), so this
    keeps actor-free elasticity without per-batch setup cost.
    """
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = TripleExtractor()
    return _EXTRACTOR(batch)


def _dedup(items) -> tuple[str, ...]:
    seen: set[str] = set()
    out: list[str] = []
    for x in items:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return tuple(out)


def reference_extract(rows: list[dict]) -> set[tuple]:
    """Single-process reference extractor (independent of the Ray stage).

    Used to measure the pipeline's P/R (BASELINE.md gate).  Intentionally a
    separate, naive line-by-line implementation of the same rule semantics.
    """
    out: set[tuple] = set()
    rules = build_rules()
    for row in rows:
        content = row["content"]
        if not content:
            continue
        lang, repo, path = row["lang"], row["repo"], row["path"]
        r = rules.get(lang)
        if r is None:
            continue
        mod = module_iri(repo, path)
        out.add((mod, RDF_TYPE, ONT + "Module"))
        out.add((mod, ONT + "definedIn", repo_iri(repo)))
        classes = _dedup(r.class_re.findall(content)) if r.class_re else ()
        functions = _dedup(r.func_re.findall(content)) if r.func_re else ()
        for c in classes:
            ci = sym_iri(repo, path, c)
            out.add((ci, RDF_TYPE, ONT + "Class"))
            out.add((ci, ONT + "memberOf", mod))
        for rx in r.import_res:
            for m in _dedup(rx.findall(content)):
                out.add((mod, ONT + "imports", "unlinked:" + m))
        for f in functions:
            fi = sym_iri(repo, path, f)
            out.add((fi, RDF_TYPE, ONT + "Function"))
            out.add((fi, ONT + "memberOf", mod))
        if r.call_re is not None:
            defined = set(functions) | set(classes)
            for name in r.call_re.findall(content):
                if name not in r.stop and name not in defined:
                    out.add((mod, ONT + "calls", "unlinked:" + name))
    return out
