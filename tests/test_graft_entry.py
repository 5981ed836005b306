"""Driver-contract tests for __graft_entry__.py.

The driver (a) compile-checks entry() single-chip and (b) runs
dryrun_multichip(8) on a host with ONE real device, expecting it to
self-provision a virtual 8-device CPU mesh. Under pytest the conftest
already forces 8 CPU devices, so dryrun_multichip takes the direct
path; the subprocess self-provisioning path is exercised by requesting
MORE devices than the test env has.
"""

import os
import sys

import pytest


def _load_entry_module():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    return __graft_entry__


def test_dryrun_multichip_direct():
    ge = _load_entry_module()
    ge.dryrun_multichip(8)  # 8 devices available -> direct path


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_subprocess():
    # 16 > 8 available devices -> must spawn the virtual-mesh subprocess
    ge = _load_entry_module()
    ge.dryrun_multichip(16)
