"""Three-process topology: UE | eNB | EPC as separate OS processes.

The reference's test/run_lte.sh launches srsepc + srsenb + srsue and pings
across; here examples/run_{epc,enb,ue}.py are launched the same way —
radio over the native UDP sample pipe, S1AP over the association, GTP-C +
GTP-U over UDP — and the assertion is the UE printing the SGi echo that
traversed every wire.
"""

import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "JAX_PLATFORMS": "cpu"}


def _spawn(script, *args):
    return subprocess.Popen(
        [sys.executable, "-u", os.path.join(REPO, "examples", script),
         *map(str, args)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=ENV)


@pytest.mark.slow
def test_three_process_attach_and_echo(tmp_path):
    port_file = tmp_path / "s1_port"
    # per-test-run radio ports so xdist workers never collide
    base = 20000 + (os.getpid() % 20000) // 2 * 2
    dl_port, ul_port = base, base + 1

    epc = _spawn("run_epc.py", port_file)
    procs = [epc]
    try:
        deadline = time.time() + 60
        while not port_file.exists() or not port_file.read_text():
            assert time.time() < deadline, "EPC never came up"
            assert epc.poll() is None, epc.stdout.read()
            time.sleep(0.1)
        s1_port = int(port_file.read_text())

        enb = _spawn("run_enb.py", s1_port, dl_port, ul_port)
        procs.append(enb)
        time.sleep(2.0)  # let the eNB bind its UL pipe before the UE talks
        ue = _spawn("run_ue.py", dl_port, ul_port)
        procs.append(ue)

        attached = echoed = False
        deadline = time.time() + 900
        while time.time() < deadline:
            line = ue.stdout.readline()
            if not line:
                break
            if line.startswith("ATTACHED"):
                attached = True
            if line.startswith("DL_DATA echo:ping-3proc"):
                echoed = True
                break
        assert attached, "UE never attached across the three processes"
        assert echoed, "SGi echo never returned to the UE"
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait(timeout=10)
