"""Capture a jax.profiler trace of the serving headline path (bench.py's
bf16 + packed CNN + MXU-mixer chained inference, bs=8 256^2).

    python tools/profile_infer.py [trace_dir=/tmp/jaxtrace_infer]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(trace_dir="/tmp/jaxtrace_infer", bs=8, hw=(256, 256)):
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.packed_conv import ftc_forward_packed
    from tcct_tpu.train.precision import cast_floating

    n_class = 5
    net = RegNet(
        base=get_model("stc_tt", n_class, variant="infer", mixer="metapool"),
        out_channels=n_class,
    )
    x = jnp.ones((bs, hw[0], hw[1], 3), jnp.float32)
    variables = jax.jit(
        lambda: net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    )()

    def step(x):
        v = cast_floating(variables, jnp.bfloat16)
        pyr, _ = ftc_forward_packed(net, v, x.astype(jnp.bfloat16))
        return x + jnp.mean(pyr[0].astype(jnp.float32)) * 1e-12

    chained = jax.jit(step)
    y = chained(x)
    jax.block_until_ready(y)
    y = chained(y)
    jax.block_until_ready(y)
    t0 = time.time()
    for _ in range(20):
        y = chained(y)
    jax.block_until_ready(y)
    print(f"steady: {(time.time()-t0)/20*1e3:.2f} ms/step", flush=True)

    with jax.profiler.trace(trace_dir):
        for _ in range(20):
            y = chained(y)
        jax.block_until_ready(y)
    print(f"trace written to {trace_dir}", flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/jaxtrace_infer"]))
