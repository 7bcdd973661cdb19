"""Model-scope semantics tests: all scopes roundtrip; scope is recorded in
the container; GOP/slice scopes produce independently decodable units."""

import os
import subprocess

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.utils.container import Reader, SCOPE_GOP, SCOPE_SLICE, SCOPE_STREAM

ROOT = os.path.join(os.path.dirname(__file__), "..")
DATA = os.path.join(ROOT, "data")


def _clip(name, *args):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run([gen, path, *map(str, args)], check=True, capture_output=True)
    return open(path, "rb").read()


def _scope_of(blob):
    r = Reader(blob)
    r.pos = 6
    return r.u16()


def test_all_scopes_roundtrip():
    data = _clip("rt_gop.mp4", 192, 160, 12, 30, 4, 1, 26, 9, 1)
    sizes = {}
    for scope, sid in (("stream", SCOPE_STREAM), ("gop", SCOPE_GOP), ("slice", SCOPE_SLICE)):
        comp = compress(data, scope=scope)
        assert _scope_of(comp) == sid
        assert decompress(comp) == data
        sizes[scope] = len(comp)
    # ratio ordering: stream <= gop <= slice (scope trades ratio for
    # parallelism; equality possible on tiny clips)
    assert sizes["stream"] <= sizes["gop"] + 64
    assert sizes["gop"] <= sizes["slice"] + 64
