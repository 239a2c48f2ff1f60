"""Mesh-wide device-side encode (the raw scan path, sharded): raw bytes /
codepoints upload sharded, the replicated LUT encodes inside each shard's
kernel, and the ppermute halo handoff rides the encoded stream. Parity
bar: identical counts vs the host-encode mesh path and the host oracle,
across engines and through session carry."""

import random

import jax
import numpy as np
import pytest

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.parallel.mesh import make_mesh
from aho_corasick_1975_tpu.parallel.sharded_scan import ShardedScanner


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def _byte_machine(n=80, seed=0):
    rng = random.Random(seed)
    m = ac.Machine()
    for _ in range(n):
        m.insert_keyword(bytes(rng.choice(b"abcde")
                               for _ in range(rng.randint(2, 7))))
    return m


def _oracle(m, signs):
    cur = m.initiate()
    return m.match_stream(cur, signs)


@pytest.mark.parametrize("engine", ["auto", "gather", "hybrid", "mxu"])
def test_sharded_raw_count_engines(mesh8, engine):
    rng = random.Random(1)
    m = _byte_machine(20 if engine == "mxu" else 80)
    text = "".join(rng.choice("abcdex ") for _ in range(60_000)).encode()
    sh = ShardedScanner(m, mesh8, n_streams_per_device=16, engine=engine)
    assert sh._raw_stream(text) is not None  # really the raw path
    assert sh.count(text) == _oracle(m, text)


def test_sharded_raw_equals_host_encode(mesh8):
    rng = random.Random(2)
    m = _byte_machine()
    text = "".join(rng.choice("abcde ") for _ in range(50_000)).encode()
    raw = ShardedScanner(m, mesh8, n_streams_per_device=8)
    host = ShardedScanner(m, mesh8, n_streams_per_device=8,
                          device_encode=False)
    assert host._raw_stream(text) is None
    assert raw.count(text) == host.count(text) == _oracle(m, text)


def test_sharded_raw_session_carry(mesh8):
    rng = random.Random(3)
    m = _byte_machine()
    text = "".join(rng.choice("abcde ") for _ in range(40_000)).encode()
    sh = ShardedScanner(m, mesh8, n_streams_per_device=8)
    sess = sh.session()
    streamed = sum(sess.feed_count(text[i:i + 997])
                   for i in range(0, len(text), 997))
    assert streamed == _oracle(m, text)


def test_sharded_raw_str_codepoints(mesh8):
    rng = random.Random(4)
    m = ac.Machine()
    for w in ["héllo", "wörld", "héwö"]:
        m.insert_keyword(w)
    text = "".join(rng.choice("héllowörd ") for _ in range(30_000))
    sh = ShardedScanner(m, mesh8, n_streams_per_device=8)
    assert sh._raw_stream(text) is not None
    assert sh.count(text) == _oracle(m, text)


def test_sharded_raw_snapshot_masks_new_letters(mesh8):
    """Letters registered after the snapshot mask to OOV on the raw path
    (insert-during-scan consistency)."""
    m = _byte_machine(10)
    sh = ShardedScanner(m, mesh8, n_streams_per_device=8)
    before = sh.count(b"abcde " * 500)
    m.insert_keyword(b"zzz")  # new letter 'z' after the snapshot
    assert sh.count(b"abcde zzz " * 500) >= 0  # no crash
    text = b"abcde " * 500
    assert sh.count(text) == before  # old corpus unchanged
    sh.refresh()
    assert sh.count(b"zzz") == 1
