"""N-step trajectory parity for the PROMPT/CLS training loops — the two
loops exercising the scientific core's hardest machinery (VERDICT r4
missing #1), completing N-step parity for all five capabilities
(SURVEY.md §0):

- transfer/prompt-tuning (`segFormer_transfer_learning_main.py:199-206`):
  frozen encoder stages [0,1] + prompt tokens [10,10,10,10] + the
  supervised loop — tests/_traj_transfer_main.py;
- few-shot domain prompting (`segFormer_fewshot_learning.py:44-133` and
  `:191-280`): per-domain CLS tokens, the dice pair loop AND the
  autoencoder loop with recon + 100*inter + 100*intra cosine losses —
  tests/_traj_fewshot_main.py.

Each runs >=10 steps from identical imported weights, asserting per-step
loss drift plus final-state agreement, like test_trajectory_parity.py
does for the supervised/teacher-student/AE loops. Both bodies run in a
FRESH interpreter (the fewshot one compiles new jits at real B5 widths —
the XLA:CPU compile-cache serializer SIGSEGV pattern, CLAUDE.md).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(__file__)


def _run(script, timeout):
    proc = subprocess.run([sys.executable, os.path.join(HERE, script)],
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    return proc.stdout


def test_transfer_trajectory_matches_reference_loop():
    out = _run("_traj_transfer_main.py", timeout=1800)
    assert "traj-transfer-ok" in out


def test_fewshot_trajectories_match_reference_loops():
    out = _run("_traj_fewshot_main.py", timeout=3600)
    assert "traj-fewshot-seg-ok" in out
    assert "traj-fewshot-ae-ok" in out
