"""Mosaic conv experiment at the flagship's hot shape (round-4 item 4's
last open suggestion): a Pallas tap-accumulate 3x3 SAME conv at
(64, 20, 7, 256)->256 bf16 — the ResBlock conv the per-site attribution
says carries the largest share of the conv core — A/B'd against XLA's
lowering, forward only, dependency-chained scans in one process.

The kernel formulates the conv as 9 shifted (2240, 256) x (256, 256)
MXU matmuls accumulating in f32 VMEM — no im2col materialization, the
whole padded input block + taps + accumulator resident in VMEM per
batch tile. If this wins convincingly it motivates a custom_vjp
production path; either way the number closes the 'Mosaic conv at the
worst shape' thread with a measurement.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

B, H, W, C = 64, 20, 7, 256
BT = 16  # batch tile: x block (16,22,9,256)bf16 1.6MB + acc 5.7MB f32


def xla_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_conv(x, w, interpret=False):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wt = w.reshape(9, C, C)

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((BT * H * W, C), jnp.float32)
        for t in range(9):
            dy, dx = divmod(t, 3)
            xs = x_ref[:, dy:dy + H, dx:dx + W, :].reshape(BT * H * W, C)
            acc = acc + jnp.dot(
                xs, w_ref[t], preferred_element_type=jnp.float32
            )
        o_ref[:] = acc.reshape(BT, H, W, C).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, H + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, C, C), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((BT, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(xp, wt)


BT2 = 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_conv_im2col(x, w, interpret=False):
    """Variant 2: build the (rows, 9C) patch matrix IN VMEM (9 shifted
    copies), then ONE (BT*H*W, 2304) x (2304, 256) MXU matmul — wider
    contraction, single matmul, at the price of VPU copy traffic."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wt = w.reshape(9 * C, C)

    def kernel(x_ref, w_ref, o_ref):
        cols = []
        for t in range(9):
            dy, dx = divmod(t, 3)
            cols.append(
                x_ref[:, dy:dy + H, dx:dx + W, :].reshape(BT2 * H * W, C)
            )
        xcol = jnp.concatenate(cols, axis=1)          # (rows, 9C)
        acc = jnp.dot(xcol, w_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = acc.reshape(BT2, H, W, C).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(B // BT2,),
        in_specs=[
            pl.BlockSpec((BT2, H + 2, W + 2, C), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9 * C, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BT2, H, W, C), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(xp, wt)


def chain(conv, x0, w, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            y = conv(c, w)
            # bounded recurrence, identical for both legs
            return (y * 0.05 + x * 0.1).astype(x.dtype), ()
        out, _ = lax.scan(body, x, None, length=iters)
        return out
    return run


def main():
    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16
    )

    # numeric parity first
    want = np.asarray(xla_conv(x, w), np.float32)
    got = np.asarray(
        pallas_conv(x, w, interpret=interpret), np.float32
    )
    err = np.abs(want - got).max()
    print(json.dumps({"parity_max_abs_err": float(err),
                      "interpret": interpret}), flush=True)
    assert err < 0.5, "bf16 conv parity"  # bf16 tap-order tolerance

    if interpret:
        print(json.dumps({"note": "CPU interpret run: no timing"}))
        return

    got2 = np.asarray(
        pallas_conv_im2col(x, w, interpret=interpret), np.float32
    )
    err2 = np.abs(want - got2).max()
    print(json.dumps({"parity_im2col_max_abs_err": float(err2)}),
          flush=True)
    assert err2 < 0.5

    iters = 400
    legs = []
    for name, conv in [("xla", xla_conv),
                       ("pallas_taps", lambda a, b: pallas_conv(a, b)),
                       ("pallas_im2col",
                        lambda a, b: pallas_conv_im2col(a, b)),
                       ("xla", xla_conv)]:
        run = chain(conv, x, w, iters)
        y = run(x)
        _ = float(jnp.sum(y.astype(jnp.float32)))  # warm + drain
        t0 = time.perf_counter()
        y = run(x)
        _ = float(jnp.sum(y.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        us = dt / iters * 1e6
        gf = 2 * B * H * W * C * C * 9 / 1e9
        legs.append(us)
        print(json.dumps({
            "leg": name, "us_per_conv": round(us, 2),
            "achieved_tflops": round(gf / us * 1e3, 1),
            "pct_of_mxu_peak": round(100 * gf / us * 1e3 / 197, 1),
        }), flush=True)
    print(json.dumps({"summary": {
        "xla_us": round(min(legs[0], legs[3]), 2),
        "pallas_taps_us": round(legs[1], 2),
        "pallas_im2col_us": round(legs[2], 2),
        "best_pallas_vs_xla_pct": round(
            100 * (min(legs[0], legs[3]) / min(legs[1], legs[2]) - 1), 1),
    }}), flush=True)


if __name__ == "__main__":
    main()
