"""Image -> video generation, end to end, on the TPU mesh.

The flagship app — counterpart of the reference's
``scripts/generate_video_demo.py``: center-crop preprocessing (:71-89),
CLIP image encode (:110-115), VAE encode with pixel-space noise
augmentation, ``mode()`` latents and NO scaling factor on encode
(:128-146), conditioning + per-frame CFG (:311-319), the step-pipelined
denoise loop (:322-387), chunked VAE decode (:154-195), MP4+GIF output
with self-describing names (:425-443), and a timing summary (:445-462).

TPU-native differences: one controller process drives every stage (no
torchrun); the denoise loop is the jitted SPMD pipeline; the two-phase
"stash latents on CPU then free the UNet" dance (:339-423) is unnecessary
— the VAE decode is a separate jitted program and XLA frees UNet
activations between programs; decode is chunked on-device.

Without converted SVD weights (this environment has no network), pass
--random-weights to exercise the full graph; with a converted checkpoint
directory, pass --checkpoint.

Example:
    python scripts/generate_video.py --image input.png --random-weights \
        --preset tiny --num-frames 4 --steps 8 --num-stages 4 --backend cpu
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGGER = logging.getLogger("vdpp.generate")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", required=False, default=None,
                   help="input image path; a synthetic gradient is used if omitted")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--preset", default="svd_xt", choices=["svd_xt", "tiny"])
    p.add_argument("--checkpoint", default=None,
                   help="converted weights dir (unet.npz/vae_decoder.npz/...)")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--num-frames", type=int, default=14)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--num-stages", type=int, default=None)
    p.add_argument("--num-samples", type=int, default=1)
    p.add_argument("--guidance-scale", type=float, default=3.0)
    p.add_argument("--cfg-mode", default="sequential", choices=["sequential", "batched"])
    p.add_argument("--solver", default="euler",
                   choices=["euler", "euler_a", "heun", "dpmpp2m"],
                   help="euler = reference semantics; heun = 2nd-order EDM "
                        "(2 UNet evals/step, use ~half the --steps); "
                        "dpmpp2m = 2nd-order multistep DPM-Solver++ "
                        "(1 eval/step, use ~half the --steps)")
    p.add_argument("--deepcache", type=int, default=0, metavar="N",
                   help="DeepCache-style cached inference: full UNet every "
                        "N steps, shallow levels in between (0 = off; "
                        "speed/quality trade — changes outputs)")
    p.add_argument("--deepcache-split", type=int, default=1,
                   help="shallow levels the cache steps still compute")
    p.add_argument("--fps", type=int, default=7)
    p.add_argument("--motion-bucket-id", type=int, default=127)
    p.add_argument("--noise-aug-strength", type=float, default=0.02)
    p.add_argument("--decode-chunk-frames", type=int, default=4)
    p.add_argument("--seq-parallel", type=int, default=1,
                   help="halo-exchange W sharding width per stage — a "
                        "(stage, seq) mesh (latent W must divide by "
                        "sp x 2^(levels-1))")
    p.add_argument("--frame-parallel", type=int, default=1,
                   help="frame sharding width per stage — a "
                        "(stage[, seq], frame) mesh (--num-frames must "
                        "divide by it)")
    p.add_argument("--decode-devices", type=int, default=0,
                   help="reserve this many devices (after the stage "
                        "devices) for VAE decode and OVERLAP each "
                        "sample's decode with the remaining samples' "
                        "diffusion ticks (the '7 stages + 1 decode chip' "
                        "topology); 0 = decode after diffusion on all "
                        "devices")
    p.add_argument("--vae-dtype", default="float32", choices=["float32", "bfloat16"],
                   help="decoder compute dtype (bfloat16 halves decode memory)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sampler-seed", type=int, default=0,
                   help="euler_a only: seed of the per-step injected "
                        "noise (construction-time; vary per run)")
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--log-level", default="INFO")
    return p


def load_and_preprocess_image(path: str | None, width: int, height: int):
    """Center-crop to the target aspect then resize (reference :71-89).
    Returns float32 (H, W, 3) in [-1, 1]."""
    import numpy as np
    from PIL import Image

    if path:
        img = Image.open(path).convert("RGB")
    else:
        # Synthetic gradient test card.
        x = np.linspace(0, 1, width, dtype=np.float32)
        y = np.linspace(0, 1, height, dtype=np.float32)
        g = np.stack(np.meshgrid(x, y), -1)
        arr = np.concatenate([g, (g[..., :1] * g[..., 1:])], -1)
        img = Image.fromarray((arr * 255).astype(np.uint8))

    w, h = img.size
    target_ratio = width / height
    if w / h > target_ratio:
        new_w = int(h * target_ratio)
        left = (w - new_w) // 2
        img = img.crop((left, 0, left + new_w, h))
    else:
        new_h = int(w / target_ratio)
        top = (h - new_h) // 2
        img = img.crop((0, top, w, top + new_h))
    img = img.resize((width, height), Image.Resampling.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    return arr * 2.0 - 1.0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from vdpp_tpu.models.clip_encoder import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
        preprocess_image,
    )
    from vdpp_tpu.models.svd_unet import SVDUNetConfig
    from vdpp_tpu.models.svd_wrapper import StableVideoUNet, make_conditioning
    from vdpp_tpu.models.vae import TemporalVAEDecoder, VAEConfig, VAEEncoder
    from vdpp_tpu.parallel.pipeline import PipelineConfig, StepPipeline
    from vdpp_tpu.utils.logging import setup_logging
    from vdpp_tpu.utils.video_io import (
        build_output_name,
        frames_to_uint8,
        save_video_gif,
        save_video_mp4,
    )

    from vdpp_tpu.utils.compile_cache import enable_persistent_cache

    setup_logging(args.log_level)
    enable_persistent_cache()
    t_start = time.perf_counter()

    if not args.checkpoint and not args.random_weights:
        LOGGER.error("provide --checkpoint or --random-weights")
        return 1

    import jax.numpy as _jnp

    vae_dtype = _jnp.bfloat16 if args.vae_dtype == "bfloat16" else _jnp.float32
    tiny = args.preset == "tiny"
    unet_cfg = SVDUNetConfig.tiny() if tiny else SVDUNetConfig.svd_xt()
    vae_cfg = VAEConfig.tiny(vae_dtype) if tiny else VAEConfig.svd(vae_dtype)
    clip_cfg = CLIPVisionConfig.tiny() if tiny else CLIPVisionConfig.vit_h_14()
    if tiny:
        import dataclasses

        # CLIP projection must match the UNet's cross-attention width.
        clip_cfg = dataclasses.replace(
            clip_cfg, projection_dim=unet_cfg.cross_attention_dim
        )
        # keep spatial dims compatible with the tiny towers
        args.width, args.height = max(args.width, 64), max(args.height, 64)

    spatial_down = 2 ** (len(vae_cfg.block_out_channels) - 1)
    lat_h, lat_w = args.height // spatial_down, args.width // spatial_down
    from vdpp_tpu.parallel.mesh import make_pipeline_and_decode_meshes

    sp, fp = args.seq_parallel, args.frame_parallel
    # deepcache composes with seq/frame since round 5 (the cache lanes
    # shard like the latent); StepPipeline still refuses stage-divergent
    # cond-branch schedules with an actionable error.
    if sp > 1 and lat_w % unet_cfg.seq_min_divisor(sp) != 0:
        LOGGER.error(
            "--seq-parallel %d: latent width %d must divide by sp x "
            "2^(levels-1) = %d", sp, lat_w, unet_cfg.seq_min_divisor(sp),
        )
        return 1
    if fp > 1 and args.num_frames % fp != 0:
        LOGGER.error("--frame-parallel %d: --num-frames %d must divide by it",
                     fp, args.num_frames)
        return 1
    mesh, overlap_decode_mesh = make_pipeline_and_decode_meshes(
        args.num_stages, args.decode_devices, args.backend, seq=sp, frame=fp
    )
    stages = mesh.shape["stage"]
    LOGGER.info(
        "generate: %dx%d, %d frames, %d steps over %d stages, CFG %.1f%s",
        args.width, args.height, args.num_frames, args.steps, stages,
        args.guidance_scale,
        f", {args.decode_devices} decode device(s)" if args.decode_devices else "",
    )

    # ---- models ----
    t0 = time.perf_counter()
    model = StableVideoUNet(unet_cfg, num_steps=args.steps, cfg_mode=args.cfg_mode,
                            solver=args.solver,
                            sampler_seed=args.sampler_seed,
                            deepcache_interval=args.deepcache,
                            deepcache_split=args.deepcache_split)
    clip_enc = CLIPVisionEncoder(clip_cfg)
    vae_enc = VAEEncoder(vae_cfg)
    vae_dec = TemporalVAEDecoder(vae_cfg)
    if args.checkpoint:
        from vdpp_tpu.utils.weights import load_params

        unet_params = load_params(
            os.path.join(args.checkpoint, "unet.npz"), dtype=unet_cfg.dtype
        )
        clip_params = load_params(os.path.join(args.checkpoint, "clip.npz"))
        vae_enc_params = load_params(os.path.join(args.checkpoint, "vae_encoder.npz"))
        vae_dec_params = load_params(os.path.join(args.checkpoint, "vae_decoder.npz"))
    else:
        unet_params = jax.jit(model.init)(jax.random.key(args.seed))
        clip_params = clip_enc.init(jax.random.key(args.seed + 1))
        vae_enc_params = vae_enc.init(jax.random.key(args.seed + 2))
        vae_dec_params = vae_dec.init(jax.random.key(args.seed + 3))
    jax.block_until_ready(unet_params)
    t_load = time.perf_counter() - t0
    LOGGER.info("models ready in %.1fs", t_load)

    # ---- conditioning ----
    t0 = time.perf_counter()
    image = load_and_preprocess_image(args.image, args.width, args.height)

    clip_px = preprocess_image(
        ((image + 1.0) * 127.5).astype(np.uint8), size=clip_cfg.image_size
    )
    clip_embeds = clip_enc.apply(clip_params, jnp.asarray(clip_px)[None])  # (1, D)
    # Free the CLIP tower immediately (the reference frees CLIP on every
    # rank after encoding, reference: generate_video_demo.py:302-307).
    jax.block_until_ready(clip_embeds)
    del clip_params

    # VAE encode with pixel-space noise augmentation; .mode(), no scaling
    # factor (reference :128-146).
    key = jax.random.key(args.seed + 4)
    noise_aug = args.noise_aug_strength * jax.random.normal(
        key, image.shape, jnp.float32
    )
    moments = vae_enc.apply(vae_enc_params, jnp.asarray(image)[None] + noise_aug)
    image_latent = vae_enc.mode(moments)  # (1, h, w, 4)
    image_latents = jnp.repeat(image_latent[:, None], args.num_frames, axis=1)
    jax.block_until_ready(image_latents)
    del vae_enc_params  # encoder no longer needed

    cond = make_conditioning(
        image_embeddings=clip_embeds,
        image_latents=image_latents,
        num_frames=args.num_frames,
        fps=args.fps,
        motion_bucket_id=args.motion_bucket_id,
        noise_aug_strength=args.noise_aug_strength,
        guidance_scale=args.guidance_scale,
    )
    t_encode = time.perf_counter() - t0
    LOGGER.info("conditioning encoded in %.1fs", t_encode)

    # ---- pipelined denoise ----
    t0 = time.perf_counter()
    step_kwargs = {}
    if sp > 1:
        step_kwargs.update(seq_axis="seq", seq_shards=sp)
    if fp > 1:
        step_kwargs.update(frame_axis="frame", frame_shards=fp)
    pipe = StepPipeline(
        mesh, model.pipeline_step_fn(**step_kwargs),
        PipelineConfig(args.steps, stages)
    )
    keys = jax.random.split(jax.random.key(args.seed), args.num_samples)
    noise = (
        jax.vmap(
            lambda k: jax.random.normal(
                k, (1, args.num_frames, lat_h, lat_w, 4), jnp.float32
            )
        )(keys)
        * model.init_noise_sigma
    )
    # dpmpp2m threads its multistep state through the payload channels;
    # pack_initial/unpack_final are identities for euler/heun.
    noise = model.pack_initial(noise)
    videos: list = [None] * args.num_samples
    if overlap_decode_mesh is not None:
        # Overlapped mode (SURVEY's "7 stages + 1 decode chip" topology):
        # the ticked executor fires a callback the moment each sample
        # finishes; decode dispatches asynchronously onto the RESERVED
        # device subset, so sample i's decode runs while samples i+1..N
        # are still denoising on the stage devices. Exact same math as
        # the two-phase path — only the schedule changes.
        def _decode_now(idx, lat):
            lat = model.unpack_final(lat)
            videos[idx] = vae_dec.decode_data_parallel(
                vae_dec_params, lat / vae_cfg.scaling_factor,
                overlap_decode_mesh, chunk_frames=args.decode_chunk_frames,
            )

        latents, _ticks = pipe.run_ticked(
            (unet_params, cond), noise, on_sample=_decode_now
        )
        jax.block_until_ready(latents)
    else:
        latents = jax.block_until_ready(pipe.run((unet_params, cond), noise))
    latents = model.unpack_final(latents)
    t_diffusion = time.perf_counter() - t0
    # Free the UNet before decode — the reference's two-phase design
    # exists for exactly this OOM (reference: generate_video_demo.py:
    # 409-411 'del model' before phase 2); here it is just dropping the
    # parameter references so XLA reclaims the HBM. (In overlapped mode
    # decode runs on its own devices, so co-residency is moot.)
    del unet_params
    import gc

    gc.collect()
    LOGGER.info("diffusion: %.1fs (%d samples, bubble %.1f%%)",
                t_diffusion, args.num_samples,
                100 * pipe.config.bubble_fraction(args.num_samples))

    # ---- decode + save ----
    t0 = time.perf_counter()
    os.makedirs(args.output_dir, exist_ok=True)
    decode_mesh = None
    stage_devices = stages * sp * fp  # ALL devices the diffusion mesh used
    if overlap_decode_mesh is None and stage_devices > 1:
        # Decode chunks in parallel over the same devices (the reference
        # decodes on one rank while the rest idle).
        from vdpp_tpu.parallel.mesh import make_data_mesh

        decode_mesh = make_data_mesh(stage_devices)
    outputs = []
    for i in range(args.num_samples):
        if videos[i] is not None:
            video = videos[i]  # dispatched during diffusion; drain here
        else:
            lat = latents[i] / vae_cfg.scaling_factor
            if decode_mesh is not None:
                video = vae_dec.decode_data_parallel(
                    vae_dec_params, lat, decode_mesh,
                    chunk_frames=args.decode_chunk_frames,
                )
            else:
                video = vae_dec.decode_chunked(
                    vae_dec_params, lat, chunk_frames=args.decode_chunk_frames
                )  # (1, F, H, W, 3)
        frames = frames_to_uint8(np.asarray(video[0]))
        name = build_output_name(
            "svd", num_frames=args.num_frames, steps=args.steps, stages=stages,
            fps=args.fps, seed=args.seed + i, ext="mp4",
        )
        path = save_video_mp4(frames, os.path.join(args.output_dir, name), args.fps)
        save_video_gif(
            frames, os.path.splitext(path)[0] + ".gif", args.fps
        )
        outputs.append(path)
    t_decode = time.perf_counter() - t0

    total = time.perf_counter() - t_start
    LOGGER.info("=" * 60)
    LOGGER.info("TIMING  load %.1fs | encode %.1fs | diffusion %.1fs | "
                "decode+save %.1fs | total %.1fs",
                t_load, t_encode, t_diffusion, t_decode, total)
    for p in outputs:
        LOGGER.info("output: %s", p)
    LOGGER.info("=" * 60)
    return 0


if __name__ == "__main__":
    sys.exit(main())
