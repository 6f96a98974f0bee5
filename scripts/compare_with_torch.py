"""Numerical-parity harness vs the official torch/diffusers SVD pipeline.

Counterpart of the reference's scripts/compare_with_official.py (:19-209):
runs step 0 of the official diffusers pipeline and of this framework's
wrapper on IDENTICAL inputs (noise imported from torch, not re-sampled —
torch and JAX RNGs differ by design, so parity is defined *given
identical noise*, see SURVEY.md "RNG parity") and reports mean/max
absolute differences; then optionally runs the full schedule on both.

Requires diffusers + torch + a local SVD checkpoint. In environments
without them (like this build environment), the script exits with a
SKIP message — the in-repo substitute oracles are tests/test_ops.py
(op-level torch parity) and tests/test_weights.py (conversion
roundtrip).

Usage:
    python scripts/compare_with_torch.py --model-dir /path/to/svd \
        [--steps 25] [--frames 14] [--height 576] [--width 1024]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--preset", choices=["svd_xt", "tiny"], default="svd_xt",
                    help="UNet topology; 'tiny' is used by the mock-diffusers "
                         "harness test (tests/test_compare_harness.py)")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--height", type=int, default=576)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--full-schedule", action="store_true")
    args = ap.parse_args()

    try:
        import torch
        from diffusers import UNetSpatioTemporalConditionModel, EulerDiscreteScheduler
    except ImportError as e:
        print(f"SKIP: diffusers/torch unavailable ({e}). "
              "Op-level parity is covered by tests/test_ops.py; "
              "conversion correctness by tests/test_weights.py.")
        return 0

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import (
        StableVideoUNet,
        make_conditioning,
        latent_from_reference_layout,
        latent_to_reference_layout,
    )
    from vdpp_tpu.utils.weights import convert_unet_state_dict

    lat_h, lat_w = args.height // 8, args.width // 8
    config = (
        SVDUNetConfig.tiny()
        if args.preset == "tiny"
        else SVDUNetConfig.svd_xt(dtype=jnp.float32)
    )

    # ---- official side ----
    torch.manual_seed(args.seed)
    unet = UNetSpatioTemporalConditionModel.from_pretrained(
        args.model_dir, subfolder="unet", torch_dtype=torch.float32
    ).eval()
    sched = EulerDiscreteScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, prediction_type="v_prediction",
        interpolation_type="linear", timestep_spacing="leading",
        timestep_type="continuous", steps_offset=1, use_karras_sigmas=True,
        sigma_min=0.002, sigma_max=700.0,
    )
    sched.set_timesteps(args.steps)

    clip_t = torch.randn(1, 1, config.cross_attention_dim)
    img_lat_t = torch.randn(1, 4, args.frames, lat_h, lat_w)
    noise_t = torch.randn(1, 4, args.frames, lat_h, lat_w)
    latent_t = noise_t * sched.init_noise_sigma
    added_t = torch.tensor([[5.0, 127.0, 0.02]])

    with torch.no_grad():
        scaled = sched.scale_model_input(latent_t, sched.timesteps[0])
        inp = torch.cat([scaled, img_lat_t], dim=1).permute(0, 2, 1, 3, 4)
        eps_t = unet(inp, sched.timesteps[0], encoder_hidden_states=clip_t,
                     added_time_ids=added_t, return_dict=False)[0]
        out_t = sched.step(
            eps_t.permute(0, 2, 1, 3, 4), sched.timesteps[0], latent_t
        ).prev_sample

    # ---- this framework, identical inputs ----
    model = StableVideoUNet(config, num_steps=args.steps)
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in unet.state_dict().items()},
        num_levels=config.num_levels,
        layers_per_block=config.layers_per_block,
        transformer_layers=config.transformer_layers_per_block,
        dtype=jnp.float32,
    )
    cond = make_conditioning(
        image_embeddings=jnp.asarray(clip_t.numpy()),
        image_latents=latent_from_reference_layout(jnp.asarray(img_lat_t.numpy())),
        num_frames=args.frames,
        guidance_scale=None,
    )
    latent_j = latent_from_reference_layout(jnp.asarray(latent_t.numpy()))
    out_j = model.step(params, latent_j, 0, cond)
    out_j_ref = np.asarray(latent_to_reference_layout(out_j))

    diff = np.abs(out_j_ref - out_t.numpy())
    print(f"step-0 parity: mean|diff|={diff.mean():.3e} max|diff|={diff.max():.3e}")

    if args.full_schedule:
        # Real diffusers' EulerDiscreteScheduler is STATEFUL: the step-0
        # parity block above advanced its internal _step_index, so without
        # a reset the full-schedule loop would run on shifted sigmas and
        # finally index past the sigma table. set_timesteps resets it.
        sched.set_timesteps(args.steps)
        x_j = latent_j
        x_t = latent_t
        for s in range(args.steps):
            x_j = model.step(params, x_j, s, cond)
            with torch.no_grad():
                sc = sched.scale_model_input(x_t, sched.timesteps[s])
                inp = torch.cat([sc, img_lat_t], dim=1).permute(0, 2, 1, 3, 4)
                e = unet(inp, sched.timesteps[s], encoder_hidden_states=clip_t,
                         added_time_ids=added_t, return_dict=False)[0]
                x_t = sched.step(
                    e.permute(0, 2, 1, 3, 4), sched.timesteps[s], x_t
                ).prev_sample
        d = np.abs(np.asarray(latent_to_reference_layout(x_j)) - x_t.numpy())
        print(f"full-schedule parity: mean|diff|={d.mean():.3e} max|diff|={d.max():.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
