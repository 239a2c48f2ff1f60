"""Standalone native-core C test (aho_corasick_1975_tpu/native/test_acx.c)
run via make — no Python in the loop. The asan-test variant of the same
target is the memory-checking harness (run it manually or in CI)."""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), "..",
                      "aho_corasick_1975_tpu", "native")

pytestmark = pytest.mark.skipif(
    not (shutil.which("make") and shutil.which("g++")),
    reason="native toolchain unavailable")


def test_make_test_target():
    out = subprocess.run(["make", "-C", NATIVE, "test"],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "acx native tests passed" in out.stdout
