"""Post-training int8 quantization for the serving path.

The v5e MXU runs s8 x s8 -> s32 at 2x its bf16 rate (394 vs 197 TOPS);
measured in-graph here, int8 3x3 convs at the flagship's deep levels run
2-3x faster than bf16 (benchmarks/int8_probe.py). This module converts a
trained f32/bf16 model into an int8-conv serving graph:

- **Weights**: per-output-channel symmetric int8 (scale = amax/127 over
  each kernel's (kh, kw, cin) slice), quantized once at export time after
  BatchNorm folding (train/fold_bn.py), stored in the weight bundle as
  int8 (4x smaller than f32).
- **Activations**: per-tensor symmetric int8 with static scales from a
  one-batch calibration pass (max |x| at every conv input).
- **Accumulation**: exact s32; dequantize + bias + ReLU stay in float and
  fuse into the conv epilogue under XLA.

The swap is done with a flax method interceptor (``nn.intercept_methods``)
that short-circuits every ``nn.Conv`` / decoder ``nn.ConvTranspose``
``__call__`` whose module path has an entry in a ``"quant"`` variables
collection — no model-code changes, so all seven zoo families plus the
legacy models are covered uniformly.
Quantized conv kernels are stripped from the ``params`` bundle (replaced
by (1,) placeholders, never read by the intercepted graph).

Quality: symmetric per-channel PTQ on these UNet-family models keeps the
served binary masks essentially identical to f32 (tests/test_quantize.py
asserts >= 0.99 mask IoU agreement and bounded logit error).

The torch reference (/root/reference) has no quantization or deployment
path; this extends its Trainer.test() capability (utils/trainer.py:186+)
with a production serving artifact.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def _pairs(v, ndim: int = 2):
    """Canonicalize a flax conv geometry attribute to per-spatial-dim."""
    if v is None:
        return (1,) * ndim
    if isinstance(v, int):
        return (v,) * ndim
    return tuple(v)


def _conv_geometry(mod: nn.Conv):
    """(strides, padding, lhs_dilation, rhs_dilation) for lax.conv, exactly
    as flax nn.Conv canonicalizes its attributes (2D NHWC case)."""
    strides = _pairs(mod.strides)
    rhs_dil = _pairs(mod.kernel_dilation)
    lhs_dil = _pairs(mod.input_dilation)
    p = mod.padding
    if isinstance(p, str):
        padding = p
    elif isinstance(p, int):
        padding = [(p, p)] * 2
    else:
        padding = [(x, x) if isinstance(x, int) else tuple(x) for x in p]
    return strides, padding, lhs_dil, rhs_dil


def _is_plain_conv(mod) -> bool:
    """Only quantize the standard dense 2D convs (everything in this zoo);
    grouped/masked/CIRCULAR convs fall back to the float path (flax
    implements CIRCULAR by wrap-padding inside __call__, which the
    interceptor bypasses — lax.conv would reject the string)."""
    return (type(mod) is nn.Conv and len(mod.kernel_size) == 2
            and mod.feature_group_count == 1 and mod.mask is None
            and (not isinstance(mod.padding, str)
                 or mod.padding in ("SAME", "VALID")))


def _is_plain_convt(mod) -> bool:
    """The zoo's decoder upconvs: plain 2D nn.ConvTranspose (k=2, s=2,
    VALID — /root/reference's ConvTranspose2d(k=2, s=2) equivalents), no
    dilation/mask/kernel-transpose. Anything fancier (incl. CIRCULAR
    padding) falls back to float."""
    return (type(mod) is nn.ConvTranspose and len(mod.kernel_size) == 2
            and mod.mask is None and not mod.transpose_kernel
            and isinstance(mod.padding, str)
            and mod.padding in ("SAME", "VALID")
            and _pairs(mod.kernel_dilation) == (1, 1))


def _is_quantizable(mod) -> bool:
    return _is_plain_conv(mod) or _is_plain_convt(mod)


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------


def calibrate_conv_amax(model, variables: dict, images) -> dict:
    """Run one eval-mode forward pass recording max |input| at every conv.

    Returns ``{module_path_tuple: float}``. Jitted as a single program (the
    interceptor collects traced amax values during tracing and returns them
    as outputs), so calibration costs one compile + one step.
    """
    if getattr(model, "remat", False):
        # nn.remat re-traces the wrapped blocks under jax.checkpoint; the
        # amax side-channel dict would then hold tracers from that inner
        # trace (UnexpectedTracerError once jit retraces). Checkpointing
        # is a training-memory feature — calibration is one eval forward —
        # so run it on a remat-free clone (identical params/paths).
        model = model.clone(remat=False)

    def run(variables, images):
        amax: dict = {}

        def icpt(next_fun, args, kwargs, context):
            mod = context.module
            if _is_quantizable(mod) and context.method_name == "__call__":
                a = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                p = mod.path
                amax[p] = jnp.maximum(amax[p], a) if p in amax else a
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(icpt):
            model.apply(variables, images, train=False)
        return amax

    out = jax.jit(run)(variables, images)
    return {p: float(v) for p, v in jax.device_get(out).items()}


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------


def _tree_get(tree: dict, path: tuple):
    for k in path:
        tree = tree[k]
    return tree


def _tree_set(tree: dict, path: tuple, value) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _quant_paths(qtree: dict, prefix: tuple = ()):
    """Module paths of the quantized convs in a ``"quant"`` tree."""
    for k, v in qtree.items():
        if isinstance(v, dict):
            if "wq" in v:
                yield prefix + (k,)
            else:
                yield from _quant_paths(v, prefix + (k,))


def calibrate_and_quantize(model, variables: dict, images,
                           min_channels: int = 0,
                           eps: float = 1e-12) -> dict:
    """Calibration forward + per-conv weight quantization fused into ONE
    jitted program: returns the ``"quant"`` tree (int8 ``wq``, scales
    ``sw``/``sx``) with zero full-tree host transfers.

    Same math as ``calibrate_conv_amax`` + ``build_quant_tree`` (jnp.round
    is round-half-even like np.rint), but where those fetch every conv
    kernel to host and push the int8 tables back — ~175 s at flagship
    scale through the remote-dispatch tunnel (~20 MB/s, per-op round
    trips) — this costs one (persistently cached) compile + ~2 s. The
    program is weight-value-independent, so it caches across differently
    trained checkpoints of the same architecture.
    """
    if getattr(model, "remat", False):
        model = model.clone(remat=False)  # see calibrate_conv_amax

    def run(variables, images):
        amax: dict = {}

        def icpt(next_fun, args, kwargs, context):
            mod = context.module
            if _is_quantizable(mod) and context.method_name == "__call__":
                a = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                p = mod.path
                amax[p] = jnp.maximum(amax[p], a) if p in amax else a
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(icpt):
            model.apply(variables, images, train=False)

        qtree: dict = {}
        for path, a in amax.items():
            kernel = _tree_get(variables["params"], path)["kernel"]
            if min_channels and max(kernel.shape[2:]) < min_channels:
                continue  # mixed precision: float path for narrow convs
            kernel = kernel.astype(jnp.float32)
            sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
            sw = jnp.where(sw < eps, 1.0, sw).astype(jnp.float32)
            wq = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
            sx = jnp.maximum(a / 127.0, eps).astype(jnp.float32)
            _tree_set(qtree, path, {"wq": wq, "sw": sw, "sx": sx})
        return qtree

    return jax.jit(run)(variables, images)


def build_quant_tree(params: dict, amax: dict, *,
                     eps: float = 1e-12) -> dict:
    """Per-conv int8 weights + scales, nested like the params tree so the
    ``"quant"`` collection scopes to each conv module under ``apply``.

    Entries: ``wq`` int8 (kh,kw,cin,cout), ``sw`` f32 (cout,) weight scale,
    ``sx`` f32 () activation scale.
    """
    qtree: dict = {}
    for path, a in amax.items():
        kernel = np.asarray(_tree_get(params, path)["kernel"], np.float32)
        sw = np.max(np.abs(kernel), axis=(0, 1, 2)) / 127.0
        sw = np.where(sw < eps, 1.0, sw).astype(np.float32)
        wq = np.clip(np.rint(kernel / sw), -127, 127).astype(np.int8)
        sx = np.float32(max(a / 127.0, eps))
        _tree_set(qtree, path, {"wq": jnp.asarray(wq),
                                "sw": jnp.asarray(sw),
                                "sx": jnp.asarray(sx)})
    return qtree


def strip_quantized_kernels(params: dict, amax: dict) -> dict:
    """Replace quantized convs' f32 kernels with (1,) placeholders — the
    intercepted graph never reads them; the weight bundle shrinks ~4x."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # deep copy dicts
    for path in amax:
        node = _tree_get(params, path)
        node["kernel"] = jnp.zeros((1,), jnp.float32)
    return params


# ---------------------------------------------------------------------------
# the int8 graph
# ---------------------------------------------------------------------------


def _quant_interceptor(next_fun, args, kwargs, context):
    """Short-circuit nn.Conv.__call__ with the int8 MXU formulation when the
    module's scope carries quantization tables."""
    mod = context.module
    if not (_is_quantizable(mod) and context.method_name == "__call__"):
        return next_fun(*args, **kwargs)
    q = mod.variables.get("quant")
    if not q or "wq" not in q:
        return next_fun(*args, **kwargs)
    x = args[0]
    out_dtype = mod.dtype or x.dtype
    xq = jnp.clip(jnp.rint(x.astype(jnp.float32) / q["sx"]),
                  -127, 127).astype(jnp.int8)
    if _is_plain_convt(mod):
        # exactly flax nn.ConvTranspose's lowering (k=2/s=2 decoder upconvs)
        y = lax.conv_transpose(
            xq, q["wq"], _pairs(mod.strides), mod.padding,
            transpose_kernel=False, preferred_element_type=jnp.int32)
    else:
        strides, padding, lhs_dil, rhs_dil = _conv_geometry(mod)
        y = lax.conv_general_dilated(
            xq, q["wq"], strides, padding,
            lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (q["sx"] * q["sw"])
    if mod.use_bias:
        y = y + mod.variables["params"]["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def quantized_apply(model, variables: dict, images, **kwargs):
    """``model.apply`` with every tabled conv running as int8 x int8 -> s32.

    ``variables`` must carry the ``"quant"`` collection from
    ``build_quant_tree``; convs without a table (and all non-conv modules)
    run unchanged.
    """
    with nn.intercept_methods(_quant_interceptor):
        return model.apply(variables, images, **kwargs)


# ---------------------------------------------------------------------------
# end-to-end: trained weights -> int8 serving program
# ---------------------------------------------------------------------------


def quantize_serving(model, params: Any, batch_stats: Any,
                     calib_images=None,
                     *, fold_bn: bool = True, strip: bool = True,
                     min_channels: int = 0, amax: dict | None = None
                     ) -> dict:
    """Fold BN, calibrate on ``calib_images``, quantize weights; returns the
    serving ``variables`` dict (params/batch_stats/quant) for
    ``quantized_apply`` / ``export_serving_int8``.

    ``min_channels`` enables MIXED-precision quantization: only convs with
    ``max(cin, cout) >= min_channels`` get int8 tables; the rest stay in
    the float graph. The shallow high-resolution levels are HBM-bound —
    there the extra quantize/requant passes cost more than the s8 MXU
    saves (measured: at 512 squared bs16, full int8 is SLOWER than bf16;
    see benchmarks/PERF_NOTES.md) — while the deep channel-heavy levels
    are compute-bound and win 2-3x.

    ``amax`` supplies activation ranges directly ({module_path_tuple:
    float}) instead of calibrating on ``calib_images`` — the QAT path
    (train/qat.py, ``qstats_amax(state.qstats)``): ranges learned as an
    EMA over the whole training run rather than one batch. Exactly one of
    ``calib_images`` / ``amax`` must be given.
    """
    if (calib_images is None) == (amax is None):
        raise ValueError(
            "quantize_serving needs exactly one of calib_images (PTQ "
            "calibration) or amax (QAT-learned ranges)")
    if fold_bn:
        from ddti_tpu.train.fold_bn import fold_batchnorm
        try:
            params, batch_stats = fold_batchnorm(model, params, batch_stats)
        except ValueError:
            # unfoldable BN placement (LegacyUNet's Conv->ReLU->BN order):
            # quantize the unfolded graph — eval-mode BN is a float affine
            # applied after the dequantized conv output, still exact
            pass
    variables = {"params": params, "batch_stats": batch_stats}
    if amax is None:
        # PTQ: calibration + weight quantization fused into one jitted
        # program (zero full-tree host transfers; see calibrate_and_quantize)
        qtree = calibrate_and_quantize(model, variables, calib_images,
                                       min_channels=min_channels)
        qpaths = list(_quant_paths(qtree))
        if strip:
            params = strip_quantized_kernels(params, qpaths)
        return {"params": params, "batch_stats": batch_stats, "quant": qtree}
    else:
        # learned ranges address UNQUANTIZED module paths; drop any entry
        # whose conv doesn't exist in this params tree (defensive: e.g. a
        # stale checkpoint from a different depth)
        def _has(path):
            try:
                return "kernel" in _tree_get(params, path)
            except (KeyError, TypeError):
                return False

        amax = {p: a for p, a in amax.items() if _has(p)}
    if min_channels:
        amax = {p: a for p, a in amax.items()
                if max(_tree_get(params, p)["kernel"].shape[2:])
                >= min_channels}
    qtree = build_quant_tree(params, amax)
    if strip:
        params = strip_quantized_kernels(params, amax)
    return {"params": params, "batch_stats": batch_stats, "quant": qtree}


def export_quantized_program(model, variables: dict, batch: int,
                             size: int, in_channels: int = 1,
                             threshold: float = 0.5,
                             input_dtype=jnp.uint8, mesh=None,
                             tta: bool = False) -> bytes:
    """Serialize an already-quantized ``variables`` tree (from
    ``quantize_serving``) as a weights-as-arguments StableHLO serving
    program. With ``mesh``, the program carries GSPMD shardings (weights +
    quant tables replicated, image batch over the ``data`` axis; ``batch``
    is then GLOBAL). One export tail for both forms — and callers that
    need several artifacts from one quantization (e.g. the Trainer's
    plain + sharded pair) quantize/calibrate once."""
    from ddti_tpu.train.export import export_program, serve_body

    def serve(variables, images):
        return serve_body(
            model, variables, images, threshold,
            apply_fn=lambda v, im: quantized_apply(model, v, im,
                                                   train=False), tta=tta)

    return export_program(serve, variables, batch, size, in_channels,
                          input_dtype, mesh=mesh)


def export_serving_int8(model, params: Any, batch_stats: Any, batch: int,
                        size: int, calib_images=None, in_channels: int = 1,
                        threshold: float = 0.5, input_dtype=jnp.uint8,
                        min_channels: int = 0,
                        mesh=None, tta: bool = False,
                        amax: dict | None = None) -> tuple[bytes, dict]:
    """Quantize + export in one call: ``serve(variables, images) ->
    uint8 masks`` with all tabled convs in s8 x s8 -> s32. Returns
    ``(blob, variables)``; pair with
    ``train.checkpoint.save_variables_npz`` for the bundle, loadable by
    ``train.export.load_serving_bundle`` (which handles the quant
    collection — and, for ``mesh`` exports, the device placement —
    transparently)."""
    variables = quantize_serving(model, params, batch_stats,
                                 calib_images, min_channels=min_channels,
                                 amax=amax)
    blob = export_quantized_program(model, variables, batch, size,
                                    in_channels, threshold, input_dtype,
                                    mesh, tta=tta)
    return blob, variables


def export_serving_int8_sharded(model, params: Any, batch_stats: Any,
                                mesh, batch: int, size: int, calib_images,
                                in_channels: int = 1,
                                threshold: float = 0.5,
                                input_dtype=jnp.uint8,
                                min_channels: int = 0,
                                tta: bool = False) -> tuple[bytes, dict]:
    """Int8 quantization + GSPMD scale-out in one artifact (convenience
    wrapper over ``export_serving_int8(mesh=...)``)."""
    return export_serving_int8(model, params, batch_stats, batch, size,
                               calib_images, in_channels, threshold,
                               input_dtype, min_channels, mesh, tta=tta)
