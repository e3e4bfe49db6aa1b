"""`tpu_tts.bin.distribute` launcher: spawns N processes wired together via
`init_distributed` (counterpart of `python -m trainer.distribute`)."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os
    os.environ["JAX_PLATTFORM_GUARD"] = "x"  # noqa - keep env simple
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tpu_tts.parallel import init_distributed
    init_distributed()
    import jax.numpy as jnp
    assert jax.process_count() == 2, jax.process_count()
    # one global psum across the two single-device processes
    from jax.experimental.multihost_utils import process_allgather
    got = process_allgather(jnp.array([jax.process_index()]))
    assert sorted(int(x) for x in got.ravel()) == [0, 1], got
    print("WORKER_OK", jax.process_index())
    """
)


@pytest.mark.slow
def test_distribute_two_cpu_processes(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("TPU_TTS_PLATFORM", None)
    # the spawned workers run `python worker.py` from tmp_path — without the
    # repo on PYTHONPATH they cannot import the (uninstalled) package; that
    # ModuleNotFoundError used to be swallowed by the skip guard below
    # because the TRACEBACK's module path contains "distribute"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "tpu_tts.bin.distribute", "--nproc", "2", "--script", str(script)],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo_root,
    )
    unsupported = ("jax.distributed.initialize", "coordinator", "UNAVAILABLE", "DEADLINE_EXCEEDED")
    if r.returncode != 0 and any(s in (r.stderr or "") for s in unsupported):
        pytest.skip(f"multi-process CPU jax unsupported here: {r.stderr[-300:]}")
    assert r.returncode == 0, r.stderr[-2000:]
    assert (r.stdout + r.stderr).count("WORKER_OK") == 2
