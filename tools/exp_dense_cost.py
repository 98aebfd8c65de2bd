"""Where do the NON-kernel 75 ms of the eval forward go? Compile the full
model and inspect XLA's cost analysis (flops / bytes accessed), then time
model variants that isolate the dense path."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gkgnet_tpu.nn.classifier import GKGNetClassifier

batch = int(os.environ.get("B", "8"))
model = GKGNetClassifier(arch="s", n_classes=80, size=576,
                         dtype=jnp.bfloat16)
x = jnp.zeros((batch, 576, 576, 3), jnp.bfloat16)
variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()


def model_scalar(v, xx):
    return jnp.sum(model.apply(v, xx, train=False)[0].astype(jnp.float32))


lowered = jax.jit(model_scalar).lower(variables, x)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
print("flops:", ca.get("flops", 0) / 1e9, "G")
print("bytes accessed:", ca.get("bytes accessed", 0) / 1e9, "GB")
for key in sorted(ca):
    if "bytes accessed" in key and ca[key] > 1e9:
        print(" ", key, f"{ca[key]/1e9:.2f} GB")

mem = compiled.memory_analysis()
if mem is not None:
    print("temp size:", getattr(mem, "temp_size_in_bytes", 0) / 1e6, "MB")
    print("output size:", getattr(mem, "output_size_in_bytes", 0) / 1e6,
          "MB")
