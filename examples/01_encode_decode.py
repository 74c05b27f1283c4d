"""Encode a few RDF statements to Jelly bytes and decode them back.

Run: python examples/01_encode_decode.py   (no Ray needed — codec only)
"""

import sys

sys.path.insert(0, ".")

from pyjelly_ray import terms as T
from pyjelly_ray.jelly import LookupPreset, StreamOptions, decode_flat, encode_flat

EX = "http://example.org/"

statements = [
    (T.iri(EX + "alice"), T.iri(EX + "knows"), T.iri(EX + "bob")),
    (T.iri(EX + "alice"), T.iri(EX + "name"), T.literal("Alice")),
    (T.iri(EX + "alice"), T.iri(EX + "age"),
     T.literal("42", datatype="http://www.w3.org/2001/XMLSchema#integer")),
    (T.iri(EX + "bob"), T.iri(EX + "name"), T.literal("Bob", lang="en")),
]

options = StreamOptions(lookup_preset=LookupPreset.small(), frame_size=2)
data = b"".join(encode_flat(iter(statements), options))
print(f"{len(statements)} statements -> {len(data)} Jelly bytes")

for stmt in decode_flat(data):
    print(" ", stmt)
