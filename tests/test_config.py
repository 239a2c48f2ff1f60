"""Runtime config system (SURVEY.md §5 "Config / flag system",
utils/config.py): one serializable object reproducibly builds machine +
scanner + sharded scanner, now covering every round-5 knob."""

import json

import aho_corasick_1975_tpu as ac
from aho_corasick_1975_tpu.utils.config import (MachineConfig, MeshConfig,
                                                ScanConfig)


def test_config_builds_scanner_with_all_knobs():
    cfg = MachineConfig(
        incremental=False,
        scan=ScanConfig(n_streams=8, step_k=2, prefilter="auto",
                        engine="gather", device_encode=False),
        mesh=MeshConfig(n_streams_per_device=4, prefilter="on"))
    m = cfg.build_machine()
    assert m.incremental is False
    for w in ("he", "she", "hers"):
        m.insert_keyword(w)
    sc = cfg.build_scanner(m)
    assert sc._prefilter == "auto" and sc._engine == "gather"
    assert sc._device_encode is False and sc.step_k == 2
    assert sc.count("ushers") == 3
    sh = cfg.build_sharded_scanner(m)
    assert sh._prefilter == "on"
    assert sh.count("ushers" * 100) == 300
    # serializes for experiment logs
    d = json.loads(cfg.to_json())
    assert d["scan"]["prefilter"] == "auto"
    assert d["mesh"]["prefilter"] == "on"


def test_config_defaults_round_trip():
    cfg = MachineConfig()
    m = cfg.build_machine()
    m.insert_keyword("abc")
    assert cfg.build_scanner(m).count("abcabc") == 2
