"""Accelerator deployment walkthrough.

Parity: tutorials/accelerator/*.ipynb (build with efficient blocks, use the
accelerator model zoo, transmute a model). Shows the three TPU deploy
paths on an X3D:

1. EfficientX3d: build from efficient blocks, convert() = BN fold + bf16
   + AOT compile.
2. convert_to_deployable_form on any hub model.
3. transmute_model: in-place registry-driven conversion.

Run: python examples/accelerator_deployment.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pytorchvideo_tpu.accelerate import (
        EfficientX3d,
        convert_to_deployable_form,
        export_stablehlo,
        transmute_model,
    )
    from pytorchvideo_tpu.models import hub

    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 4, 160, 160, 3)),
        jnp.float32,
    )

    # 1. efficient-block model with a train->deploy conversion
    eff = EfficientX3d(expansion="XS", num_classes=400)
    eff.init(jax.random.PRNGKey(0), x)
    eff.convert(x)  # BN fold + bf16 + AOT
    t0 = time.perf_counter()
    out = eff(x)
    print(f"EfficientX3d deploy: {out.shape} in {time.perf_counter()-t0:.3f}s")

    # 2. any hub model -> deployable (AOT-compiled, folded, cast)
    model = hub.x3d_xs(model_num_class=400)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    compiled, deploy_vars = convert_to_deployable_form(
        model, variables, x, dtype=jnp.bfloat16
    )
    print("deployable:", compiled(deploy_vars, jnp.asarray(x, jnp.bfloat16)).shape)

    # 3. transmuter registry
    model2, variables2 = transmute_model(model, variables, target_device="tpu")
    print("transmuted:", model2.apply(variables2, jnp.asarray(x, jnp.bfloat16), False).shape)

    # export for serving (serialized StableHLO bytes via jax.export)
    blob = export_stablehlo(model, variables, x)
    print(f"stablehlo exported: {len(blob)} bytes")


if __name__ == "__main__":
    main()
