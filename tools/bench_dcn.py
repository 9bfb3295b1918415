"""Microbenchmark + correctness check for the DCN kernels on the live chip.

Compares the XLA dense-window form against the Pallas kernel (adaptive and
non-adaptive) at the decoder's level shapes, with offset magnitudes swept
over the realistic trained range (offsets are zero-init and concentrate
within ~1-2 px after training; reference dcn_v2_im2col_cuda.cu samples
unboundedly).

Usage: python tools/bench_dcn.py [--levels stride4] [--radius 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--radius", type=int, default=3)
    p.add_argument("--tile_h", type=int, default=8)
    p.add_argument("--off_std", type=float, default=0.75)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--levels", default=None, help="comma list: s4_c64,s8_c128,s16_c256")
    p.add_argument("--dtype", default="float32", help="x/mask/weight dtype (bfloat16 = model path)")
    p.add_argument("--skip_dense", action="store_true", help="time only the Pallas kernels")
    p.add_argument("--skip_full", action="store_true", help="skip the non-adaptive Pallas timing")
    p.add_argument(
        "--bwd", action="store_true",
        help="also time the backward pass: Pallas kernels vs XLA-autodiff "
        "of the dense form, and cross-check all five cotangents",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    # the XLA-dense ORACLE must not run its f32 matmuls as bf16 passes
    # (TPU default): the correctness gates below compare against it at
    # 1e-2/1e-4, and default precision puts ~2e-3 of noise on the oracle's
    # grad_offset/grad_mask (round-5 finding; kernels were fine). Only for
    # f32 runs — a global 'highest' asks Mosaic for fp32 contractions on
    # the bf16 kernels' matmuls, which it rejects ("Bad lhs type")
    if args.dtype == "float32" and not os.environ.get("JAX_DEFAULT_MATMUL_PRECISION"):
        jax.config.update("jax_default_matmul_precision", "highest")

    from dcd_tpu.ops.dcn import deform_conv2d_dense
    from dcd_tpu.ops import dcn_pallas

    # decoder level shapes of the full 384x1280 model (NHWC)
    levels = {
        "s4_c64": (args.batch, 96, 320, 64, 64),
        "s8_c128": (args.batch, 48, 160, 128, 128),
        "s16_c256": (args.batch, 24, 80, 256, 256),
    }
    if args.levels:
        keep = args.levels.split(",")
        levels = {k: v for k, v in levels.items() if k in keep}
    mdtype = jnp.dtype(args.dtype)
    K = 9
    rng = np.random.RandomState(0)

    # tunnel sync: fetch ONE on-device-computed scalar (fetching the whole
    # output array over the axon tunnel costs tens of seconds per call)
    sync = jax.jit(lambda o: jnp.float32(o.ravel()[0]))

    def timeit(fn, *a):
        out = fn(*a)
        np.asarray(sync(out))  # force completion via tiny host fetch
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            np.asarray(sync(out))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3, out

    for name, (B, H, W, C, Cout) in levels.items():
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(mdtype)
        off = jnp.asarray(
            (rng.randn(B, H, W, 2 * K) * args.off_std).astype(np.float32)
        )
        mask = jax.nn.sigmoid(jnp.asarray(rng.randn(B, H, W, K).astype(np.float32))).astype(mdtype)
        w = jnp.asarray((rng.randn(3, 3, C, Cout) * 0.05).astype(np.float32)).astype(mdtype)
        b = jnp.asarray(rng.randn(Cout).astype(np.float32)).astype(mdtype)

        dense = jax.jit(
            lambda x, o, m, w, b: deform_conv2d_dense(
                x, o, m, w, b, stride=1, padding=1, radius=args.radius
            )
        )
        pal_ad = jax.jit(
            lambda x, o, m, w, b: dcn_pallas._forward_pallas(
                x, o, m, w, b, args.radius, args.tile_h, adaptive=True
            )
        )
        pal_na = jax.jit(
            lambda x, o, m, w, b: dcn_pallas._forward_pallas(
                x, o, m, w, b, args.radius, args.tile_h, adaptive=False
            )
        )

        t_ad, o_ad = timeit(pal_ad, x, off, mask, w, b)
        if args.skip_dense:
            t_dense, o_dense = float("nan"), o_ad
        else:
            t_dense, o_dense = timeit(dense, x, off, mask, w, b)
        if args.skip_full:
            t_na, o_na = float("nan"), o_dense
        else:
            t_na, o_na = timeit(pal_na, x, off, mask, w, b)
        o32 = o_dense.astype(jnp.float32)
        err_ad = float(jnp.max(jnp.abs(o_ad.astype(jnp.float32) - o32)))
        err_na = float(jnp.max(jnp.abs(o_na.astype(jnp.float32) - o32)))
        ref = float(jnp.max(jnp.abs(o32)))
        print(
            f"{name}: dense {t_dense:7.2f} ms | pallas-adaptive {t_ad:7.2f} ms "
            f"| pallas-full {t_na:7.2f} ms | max|err| ad={err_ad:.2e} na={err_na:.2e} "
            f"(scale {ref:.1f}) off_std={args.off_std} tile_h={args.tile_h} dtype={args.dtype}"
        )
        if err_ad > 1e-2 * ref or err_na > 1e-2 * ref:
            print("FAIL: kernel mismatch", file=sys.stderr)
            sys.exit(1)

        if args.bwd:
            g = jnp.asarray(rng.randn(B, H, W, Cout).astype(np.float32))

            def loss_pallas(x, o, m, w, b):
                return jnp.vdot(
                    dcn_pallas.deform_conv2d_pallas(x, o, m, w, b, args.radius, args.tile_h),
                    g,
                )

            def loss_dense(x, o, m, w, b):
                return jnp.vdot(
                    deform_conv2d_dense(x, o, m, w, b, stride=1, padding=1, radius=args.radius),
                    g,
                )

            grad_p = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4)))
            grad_d = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2, 3, 4)))
            t_bp, gp = timeit(lambda *a: grad_p(*a)[0], x, off, mask, w, b)
            t_bd, gd = timeit(lambda *a: grad_d(*a)[0], x, off, mask, w, b)
            gp_all, gd_all = grad_p(x, off, mask, w, b), grad_d(x, off, mask, w, b)
            errs = [
                float(jnp.max(jnp.abs(a - bb)) / (jnp.max(jnp.abs(bb)) + 1e-9))
                for a, bb in zip(gp_all, gd_all)
            ]
            print(
                f"{name} bwd: pallas {t_bp:7.2f} ms | xla-dense {t_bd:7.2f} ms "
                f"| rel errs {['%.1e' % e for e in errs]}"
            )
            # bf16 runs: BOTH sides accumulate sampling sums in bf16, so
            # agreement is bounded by bf16 rounding (~1e-2), not kernel
            # fidelity — the tight cross-check is the f32 run (and the f64
            # finite-difference oracles in tests/test_dcn.py)
            bwd_tol = 1e-4 if mdtype == jnp.float32 else 2e-2
            if max(errs) > bwd_tol:
                print("FAIL: backward mismatch", file=sys.stderr)
                sys.exit(1)


if __name__ == "__main__":
    main()
