"""ACM_INCREMENTAL_STRING_MATCHING parity (reference aho_corasick.h:98).

The reference reports the compiled algorithm variant through this constant
(c:596-600); here the variant is per-machine, so the h:98 semantics are a
function of the machine.
"""

from aho_corasick_1975_tpu import api


def test_mode_reported_per_machine():
    meyer = api.acm_create(incremental=True)
    ac75 = api.acm_create(incremental=False)
    assert api.acm_incremental_string_matching(meyer) == 1
    assert api.acm_incremental_string_matching(ac75) == 0
    # the module constant reports the default-build mode, like the
    # reference's default (Meyer) build
    assert api.ACM_INCREMENTAL_STRING_MATCHING == 1
