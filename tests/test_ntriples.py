"""N-Triples/N-Quads reader/writer tests, incl. .nt → Jelly → .nt."""

from __future__ import annotations

import pytest

from pyjelly_ray import terms as T
from pyjelly_ray.sources.ntriples import (
    format_statement,
    parse_line,
    read_ntriples,
    write_ntriples,
)

NT_SAMPLE = """\
# a comment line
<http://e/s> <http://e/p> <http://e/o> .
<http://e/s> <http://e/p> "plain lit" .
<http://e/s> <http://e/p> "hola"@es .
<http://e/s> <http://e/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
_:b1 <http://e/p> "esc \\"q\\" and \\n newline and \\u00e9" .

<http://e/s2> <http://e/p> _:b2 .
"""


def test_parse_line_forms():
    s = parse_line('<http://e/s> <http://e/p> "hola"@es .')
    assert s == (T.iri("http://e/s"), T.iri("http://e/p"), T.literal("hola", lang="es"))
    s = parse_line('_:b <http://e/p> "x\\ny"^^<http://e/dt> .')
    assert s == (T.bnode("b"), T.iri("http://e/p"), T.literal("x\ny", datatype="http://e/dt"))
    assert parse_line("# comment") is None
    assert parse_line("") is None
    q = parse_line("<http://e/s> <http://e/p> <http://e/o> <http://e/g> .")
    assert len(q) == 4 and q[3] == T.iri("http://e/g")


def test_format_roundtrip():
    stmts = [
        (T.iri("http://e/s"), T.iri("http://e/p"), T.literal('has "quotes"\nand\tnl')),
        (T.bnode("x"), T.iri("http://e/p"), T.literal("é", lang="fr")),
        (T.iri("http://e/s"), T.iri("http://e/p"), T.literal("1", datatype="http://e/dt")),
    ]
    for s in stmts:
        assert parse_line(format_statement(s)) == s


def test_read_write_ntriples(ray_session, tmp_path):
    src = tmp_path / "in.nt"
    src.write_text(NT_SAMPLE)
    ds = read_ntriples(str(src))
    rows = ds.take_all()
    assert len(rows) == 6

    out_dir = str(tmp_path / "out")
    write_ntriples(read_ntriples(str(src)), out_dir)
    back = read_ntriples(out_dir + "/").take_all()

    def key(r):
        return tuple(sorted((k, str(v)) for k, v in r.items()))

    assert sorted(map(key, back)) == sorted(map(key, rows))


def test_nt_to_jelly_to_nt(ray_session, tmp_path, pyjelly_reference):
    """.nt → statement Dataset → Jelly datasink → decode → same set."""
    import glob
    import io
    import sys

    from pyjelly_ray.sinks.jelly_sink import JellyDatasink
    from pyjelly_ray.sources.jelly_source import read_jelly

    src = tmp_path / "in.nt"
    src.write_text(NT_SAMPLE)
    ds = read_ntriples(str(src))
    jelly_dir = str(tmp_path / "jelly")
    ds.write_datasink(JellyDatasink(jelly_dir))
    back = read_jelly(jelly_dir).take_all()
    assert len(back) == 6

    # cross-check with the reference parser
    sys.path.insert(0, "/root/reference")
    from pyjelly.integrations.generic.generic_sink import GenericStatementSink

    total = 0
    for fp in glob.glob(jelly_dir + "/*.jelly"):
        sink = GenericStatementSink()
        sink.parse(io.BytesIO(open(fp, "rb").read()))
        total += len(sink._store)
    assert total == 6


def test_cli_to_jelly_from_jelly_roundtrip(ray_session, tmp_path):
    """CLI conversion both ways: .nt → .jelly → .nt preserves the statement set."""
    import glob

    from pyjelly_ray.cli import main

    src = tmp_path / "in.nt"
    src.write_text(NT_SAMPLE)
    jelly_dir = str(tmp_path / "jelly")
    nt_dir = str(tmp_path / "nt_back")
    assert main(["to-jelly", "--nt", str(src), "--out", jelly_dir]) == 0
    assert glob.glob(jelly_dir + "/part-*.jelly")
    assert main(["from-jelly", "--jelly", jelly_dir, "--out", nt_dir]) == 0
    got = set()
    for fp in glob.glob(nt_dir + "/*"):
        for line in open(fp).read().splitlines():
            if line.strip():
                got.add(parse_line(line))
    orig = {
        parse_line(l)
        for l in NT_SAMPLE.splitlines()
        if l.strip() and not l.lstrip().startswith("#")
    }
    assert got == orig
