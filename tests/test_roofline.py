"""Profile-report tool: trace a jitted fn on CPU, parse the xplane, report."""

import io

import jax
import jax.numpy as jnp
import numpy as np


def test_profile_report_from_real_trace(tmp_path):
    from tpu_tts.utils.profiling import profile_trace
    from tpu_tts.utils.roofline import profile_report

    a = jnp.ones((256, 256), jnp.float32)

    @jax.jit
    def f(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    _ = np.asarray(f(a))  # compile outside the trace
    with profile_trace(str(tmp_path)):
        _ = np.asarray(f(a))

    buf = io.StringIO()
    ranked = profile_report(str(tmp_path), top=10, device_substr="CPU", file=buf,
                            flops=4 * 2 * 256**3)
    out = buf.getvalue()
    assert ranked, f"no ops parsed:\n{out}"
    assert "TOTAL" in out and "roofline" in out
    assert all(sec >= 0 for _, sec in ranked)
