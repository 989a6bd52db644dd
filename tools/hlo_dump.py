#!/usr/bin/env python3
"""Dump the TPU-optimized HLO of the 2-window eval predictor to a file
(compile is served from the persistent cache when warm), for layout/copy
forensics.  Usage: python tools/hlo_dump.py [outfile]"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pred_hlo.txt"
    from vs_seg_tpu.infer.engine import make_predictor
    from vs_seg_tpu.models.unet2d5_spvpa import UNet2d5_spvPA
    from vs_seg_tpu.train.trainer import init_model

    model = UNet2d5_spvPA(dtype=jnp.bfloat16)
    variables = init_model(model, 0)
    predictor = make_predictor(model, variables["params"],
                               variables.get("batch_stats", {}),
                               dtype=jnp.bfloat16)
    x = jax.ShapeDtypeStruct((2, 64, 384, 384, 1), jnp.bfloat16)
    compiled = predictor.lower(x).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {out}")


if __name__ == "__main__":
    main()
