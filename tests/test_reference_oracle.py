"""Differential conformance against the COMPILED REFERENCE.

The reference C sources (mounted read-only) are compiled unmodified against
our minimal minimaps shim (tests/reference_oracle/map.h|map_shim.c) in both
algorithm modes, then:

* the README demo binary must print the golden line;
* acm_print / acm_foreach_keyword output must match our dump byte-for-byte;
* randomized dictionaries + texts run through the reference's streaming
  match and through our host + device paths must yield the identical
  (end, index, keyword) event stream.

Skipped when the reference mount or a C compiler is unavailable.
"""

import io
import os
import random
import shutil
import subprocess

import pytest

import aho_corasick_1975_tpu as ac

REF = "/root/reference"
ORACLE_DIR = os.path.join(os.path.dirname(__file__), "reference_oracle")
BUILD = "/tmp/ac_ref_oracle_build"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(os.path.join(REF, "aho_corasick.c"))
         and shutil.which("gcc")),
    reason="reference sources or gcc unavailable")


def build(name, sources, mode=""):
    os.makedirs(BUILD, exist_ok=True)
    out = os.path.join(BUILD, name)
    if not os.path.exists(out):
        cmd = (["gcc", "-O2", "-std=c11"] + ([mode] if mode else [])
               + [f"-I{ORACLE_DIR}", f"-I{REF}",
                  os.path.join(REF, "aho_corasick.c")]
               + sources + [os.path.join(ORACLE_DIR, "map_shim.c"),
                            "-o", out])
        subprocess.run(cmd, check=True, capture_output=True)
    return out


@pytest.fixture(scope="module", params=["", "-DNMEYER_85"],
                ids=["meyer85", "ac75"])
def mode(request):
    return request.param


def test_reference_demo_golden(mode):
    exe = build(f"ref_test{mode}", [os.path.join(REF, "examples/test.c")],
                mode)
    out = subprocess.run([exe], capture_output=True, text=True, check=True)
    assert out.stdout.splitlines()[1] == \
        " 6:he 5:she 6:hers 12:he 21:his 38:he 37:she 56:he 56:hers"


def test_print_and_enumeration_parity(mode):
    exe = build(f"print_demo{mode}",
                [os.path.join(ORACLE_DIR, "print_demo.c")], mode)
    ref_out = subprocess.run([exe], capture_output=True, text=True,
                             check=True).stdout

    m = ac.Machine(incremental=(mode == ""))
    for w in ["he", "she", "his", "hers"]:
        m.insert_keyword(w)
    ours = [f"nb={m.nb_keywords()}"]
    ours += [f"kw:{k.text()}" for k in m.keywords()]
    buf = io.StringIO()
    m.print(buf)
    got = "\n".join(ours) + "\n" + buf.getvalue()
    assert got == ref_out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_streaming_differential_fuzz(mode, seed, tmp_path):
    exe = build(f"stream_oracle{mode}",
                [os.path.join(ORACLE_DIR, "stream_oracle.c")], mode)
    rng = random.Random(1000 + seed)
    alphabet = ["ab", "abcd", "a", "abcdefgh"][seed % 4]
    kws = sorted({"".join(rng.choice(alphabet)
                          for _ in range(rng.randint(1, 7 + seed)))
                  for _ in range(30 + 40 * (seed % 3))})
    rng.shuffle(kws)
    text = "".join(rng.choice(alphabet + "x")
                   for _ in range(3000 + 2000 * (seed % 2)))
    dict_file = tmp_path / "dict.txt"
    text_file = tmp_path / "text.txt"
    dict_file.write_text("\n".join(kws) + "\n")
    text_file.write_text(text)

    ref = subprocess.run([exe, str(dict_file), str(text_file)],
                         capture_output=True, text=True, check=True)
    ref_events = ref.stdout.splitlines()

    m = ac.Machine(incremental=(mode == ""))
    for kw in kws:
        m.insert_keyword(kw)

    # host streaming path
    cur = m.initiate()
    host_events = []
    for i, ch in enumerate(text):
        for j in range(m.match(cur, ch)):
            host_events.append(f"{i}:{j}:{m.get_match(cur, j).text()}")
    assert host_events == ref_events

    # device path (round 4: find_matches defaults to the packed k-gram
    # fast retrieval when available — this diff runs it against the
    # compiled reference)
    sc = m.scanner(n_streams=8)
    dev_events = [f"{ev.end}:{ev.index}:{match.text()}"
                  for ev, match in sc.find_matches(text)]
    assert dev_events == ref_events
    assert sc.count(text) == len(ref_events)
    # explicitly bounded retrieval leg
    bounded = [f"{ev.end}:{ev.index}:{match.text()}"
               for ev, match in sc.find_matches(text, max_hits=1 << 14)]
    assert bounded == ref_events


def test_mrs_dalloway_differential(mode, tmp_path):
    """Real-corpus differential: a 300-word English dictionary over the
    first 60KB of the normalized reference corpus — reference events vs
    host streaming vs device scan."""
    import re
    corpus_path = os.path.join(REF, "examples/mrs_dalloway.txt")
    if not os.path.exists(corpus_path):
        pytest.skip("corpus not mounted")
    raw = open(corpus_path, errors="replace").read()
    text = re.sub(r"[^a-z]", " ", raw.lower())[:60_000]
    freq = {}
    for w in text.split():
        freq[w] = freq.get(w, 0) + 1
    kws = [" " + w + " " for w in
           sorted(freq, key=lambda w: (-freq[w], w))[:300]]

    exe = build(f"stream_oracle{mode}",
                [os.path.join(ORACLE_DIR, "stream_oracle.c")], mode)
    dict_file = tmp_path / "dict.txt"
    text_file = tmp_path / "text.txt"
    dict_file.write_text("\n".join(kws) + "\n")
    text_file.write_text(text)
    ref = subprocess.run([exe, str(dict_file), str(text_file)],
                         capture_output=True, text=True, check=True)
    ref_events = ref.stdout.splitlines()
    assert len(ref_events) > 1000  # the corpus really matches a lot

    m = ac.Machine(incremental=(mode == ""))
    for kw in kws:
        m.insert_keyword(kw)
    sc = m.scanner(n_streams=64)
    dev_events = [f"{ev.end}:{ev.index}:{match.text()}"
                  for ev, match in sc.find_matches(text)]
    assert dev_events == ref_events


@pytest.mark.slow
def test_generic_test2_word_counts_differential(mode, tmp_path):
    """Compile and run the reference's OWN generic test (Test 2: build the
    dictionary incrementally from mrs_dalloway.txt while scanning, counting
    occurrences in the associated values) and compare the full per-keyword
    count map against our incremental replay."""
    corpus = os.path.join(REF, "examples/mrs_dalloway.txt")
    if not os.path.exists(corpus):
        pytest.skip("corpus not mounted")
    exe = build(f"generic_test{mode}",
                [os.path.join(REF, "examples/aho_corasick_generic_test.c")],
                mode)
    shutil.copy(corpus, tmp_path / "mrs_dalloway.txt")
    out = subprocess.run([exe, "2"], capture_output=True, text=True,
                         check=True, cwd=tmp_path)
    assert "6966 keywords registered." in out.stdout
    import re as _re
    ref_counts = dict(
        (kw, int(v))
        for kw, v in _re.findall(r"\{'([^']*)'=(\d+)\}", out.stdout))
    assert len(ref_counts) == 6966

    # Our replay of the same loop: register each new space-wrapped word
    # with value [1]; every match increments the matched keyword's value.
    raw = open(corpus, errors="replace").read()
    # Match the reference's normalization exactly: iswalpha/towlower under
    # a UTF-8 locale — accented letters are alphabetic (the corpus has
    # café/brontë/fräulein...), so use Unicode-aware isalpha/lower.
    text = "".join(ch.lower() if ch.isalpha() else " " for ch in raw)
    m = ac.Machine(incremental=(mode == ""))
    cur = m.initiate()
    m.match(cur, " ")
    line = " "
    for ch in text:
        nb = m.match(cur, ch)
        line += ch
        if nb:
            for j in range(nb):
                m.get_match(cur, j).value[0] += 1
            line = " "
        elif ch == " ":
            if line != "  ":
                m.insert_keyword(line, value=[1])
            line = " "
    ours = {k.text(): k.value[0] for k in m.keywords()}
    assert ours == ref_counts
