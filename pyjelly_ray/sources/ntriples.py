"""N-Triples / N-Quads text format: Ray-native reader and writer.

The reference consumes W3C ``.nt``/``.nq`` fixtures through a line-based
test parser (/root/reference/tests/utils/generic_sink_test_parser.py —
semantics only; this implementation is original and regex-based).

Ray mapping: ``read_ntriples`` = ``read_text`` → per-batch vectorized line
parse (statements are line-independent, so unlike Jelly this format
parallelizes at line granularity); ``write_ntriples_datasink`` emits one
text file per write task.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..terms import KIND_BNODE, KIND_DEFAULT, KIND_IRI, KIND_LITERAL

_TERM = re.compile(
    r"""\s*(?:
        <(?P<iri>[^>]*)>
      | _:(?P<bnode>\S+)
      | "(?P<lex>(?:[^"\\]|\\.)*)"
        (?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9\-]+))?
    )""",
    re.X,
)

_UNESCAPE = {
    "\\n": "\n", "\\r": "\r", "\\t": "\t", '\\"': '"', "\\\\": "\\",
    "\\b": "\b", "\\f": "\f",
}
_ESCAPE_RE = re.compile(r'[\\"\n\r\t\b\f]')
_UNESCAPE_RE = re.compile(r"\\(?:u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|[nrtbf\"\\])")


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s

    def sub(m: re.Match) -> str:
        tok = m.group(0)
        if tok in _UNESCAPE:
            return _UNESCAPE[tok]
        return chr(int(tok[2:], 16))

    return _UNESCAPE_RE.sub(sub, s)


def _escape(s: str) -> str:
    return _ESCAPE_RE.sub(
        lambda m: {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r",
                   "\t": "\\t", "\b": "\\b", "\f": "\\f"}[m.group(0)],
        s,
    )


def parse_line(line: str):
    """One .nt/.nq line → tuple of term tuples (3 or 4), or None (comment)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    pos = 0
    terms = []
    while pos < len(line) and len(terms) < 4:
        if line[pos:].lstrip().startswith("."):
            break
        m = _TERM.match(line, pos)
        if not m:
            raise ValueError(f"bad N-Triples term at {pos}: {line!r}")
        if m.group("iri") is not None:
            terms.append((KIND_IRI, _unescape(m.group("iri")), None, None))
        elif m.group("bnode") is not None:
            terms.append((KIND_BNODE, m.group("bnode"), None, None))
        else:
            terms.append(
                (
                    KIND_LITERAL,
                    _unescape(m.group("lex")),
                    m.group("lang"),
                    _unescape(m.group("dt")) if m.group("dt") else None,
                )
            )
        pos = m.end()
    if len(terms) < 3:
        raise ValueError(f"too few terms: {line!r}")
    return tuple(terms)


def format_term(t) -> str:
    kind = t[0]
    if kind == KIND_IRI:
        return f"<{t[1]}>"
    if kind == KIND_BNODE:
        return f"_:{t[1]}"
    if kind == KIND_LITERAL:
        base = f'"{_escape(t[1])}"'
        if t[2]:
            return f"{base}@{t[2]}"
        if t[3]:
            return f"{base}^^<{t[3]}>"
        return base
    if kind == KIND_DEFAULT or kind is None:  # default graph (or absent column)
        return ""
    raise ValueError(f"cannot format kind {kind}")


def format_statement(stmt) -> str:
    parts = [format_term(t) for t in stmt]
    if len(parts) == 4 and parts[3] == "":  # default graph in .nq = omitted
        parts = parts[:3]
    return " ".join(parts) + " ."


def lines_to_table(lines) -> pa.Table:
    from .jelly_source import statements_to_table

    stmts = []
    for line in lines:
        parsed = parse_line(line)
        if parsed is not None:
            stmts.append(parsed)
    return statements_to_table(stmts)


def parse_lines_batch(batch: dict) -> pa.Table:
    """map_batches fn over ``read_text`` output (column 'text')."""
    return lines_to_table(batch["text"])


def read_ntriples(paths, **read_kwargs):
    """``.nt``/``.nq`` files → flattened statement Dataset."""
    import ray

    lines = ray.data.read_text(paths, **read_kwargs)
    return lines.map_batches(parse_lines_batch, batch_format="numpy")


def table_to_lines(batch: pa.Table) -> pa.Table:
    from ..sinks.jelly_sink import rows_to_terms

    out = [format_statement(s) for s in rows_to_terms(batch)]
    return pa.table({"text": pa.array(out, pa.string())})


def write_ntriples(ds, out_dir: str):
    """Statement Dataset → .nt text files (one per block via write_csv-free
    plain text datasink: uses Ray's text writing through map + write)."""
    lines = ds.map_batches(table_to_lines, batch_format="pyarrow")
    # Ray has no write_text for datasets of strings pre-2.50 with custom
    # naming; reuse the CSV writer without headers would quote — instead
    # write via a tiny custom datasink.
    import os

    import ray
    from ray.data import Datasink
    from ray.data.block import BlockAccessor

    class _TextSink(Datasink):
        def __init__(self, path: str) -> None:
            self.path = path

        def on_write_start(self) -> None:
            os.makedirs(self.path, exist_ok=True)

        def write(self, blocks, ctx):
            out = os.path.join(self.path, f"part-{ctx.task_idx:06d}.nt")
            wrote = False
            with open(out, "w") as f:
                for block in blocks:
                    t = BlockAccessor.for_block(block).to_arrow()
                    if t.num_rows == 0 or "text" not in t.column_names:
                        continue  # empty splits arrive schema-less
                    wrote = True
                    for v in t.column("text").to_pylist():
                        f.write(v)
                        f.write("\n")
            if not wrote:
                os.remove(out)
            return "ok"

    lines.write_datasink(_TextSink(out_dir))
    return out_dir
