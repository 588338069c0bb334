"""Validate the cross-backend gradient oracle on hardware (VERDICT r4 #4).

Three measurements on the real TPU:
  1. healthy tree: TPU vs CPU divergence (calibrates the gate tolerance),
  2. PSDR_GATHER=convert on the TPU side (the deliberately-reverted
     elision-broken split): the oracle MUST exceed tolerance,
  3. PSDR_GATHER=highest (plain f32 matmul): sanity — should match like
     the healthy tree.

Run: nohup python -u scripts/oracle_validate.py > /tmp/oracle_validate.log &
"""
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import crosscheck  # noqa: E402


def cpu_result():
    path = os.path.join(tempfile.mkdtemp(prefix="psdr_oracle_"), "cpu.npz")
    script = "/root/repo/tests/crosscheck.py"
    env = dict(os.environ)
    env.pop("PSDR_GATHER", None)  # CPU side always runs the healthy split
    subprocess.run([sys.executable, script, "--cpu", path], check=True,
                   env=env, timeout=1800)
    return crosscheck.load(path)


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    cpu = cpu_result()
    print("cpu loss:", cpu[0], flush=True)

    for mode in ("bf16x3", "convert", "highest"):
        os.environ["PSDR_GATHER"] = mode
        res = crosscheck.compute()
        rel = crosscheck.compare(cpu, res)
        print(f"mode={mode}: tpu loss={res[0]:.8f}  rel={rel}", flush=True)
    os.environ.pop("PSDR_GATHER", None)


if __name__ == "__main__":
    main()
