"""Serving export: serialize the trained model's inference function as a
StableHLO artifact (jax.export) — weights baked in, loadable without the
framework's Python model code. The deployment-path capability the torch
reference has no analogue for.

  blob = export_serving(model, params, batch_stats, batch, size)
  fn = load_serving(blob)          # fn(images_f32[N,H,W,C]) -> masks_u8
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import export as jax_export


def serve_body(model, variables, images, threshold: float = 0.5,
               apply_fn=None, tta: bool = False):
    """THE serving computation, shared by every exporter (plain, sharded,
    int8 via ``apply_fn``): uint8 [0,255] or float [0,1] images in,
    binarized uint8 masks out. ``tta=True`` bakes the 4-way flip
    test-time-augmentation ensemble (eval/tta.py) into the graph."""
    if images.dtype == jnp.uint8:
        compute = getattr(model, "dtype", None) or jnp.float32
        images = images.astype(compute) / 255.0
    apply = apply_fn or (lambda v, im: model.apply(v, im, train=False))

    def fwd(im):
        out = apply(variables, im)
        return out[0] if isinstance(out, tuple) else out

    if tta:
        from ddti_tpu.eval.tta import tta_probs
        probs = tta_probs(fwd, images)
    else:
        probs = jax.nn.sigmoid(fwd(images).astype(jnp.float32))
    return (probs > threshold).astype(jnp.uint8)


def make_serve_fn(model, params: Any, batch_stats: Any,
                  threshold: float = 0.5, tta: bool = False):
    """Closed-over inference function -> uint8 masks. The input dtype is
    decided at trace time by ``serve_body``'s dtype sniff: trace with a
    uint8 spec and the artifact is the full serving entry (raw [0,255]
    bytes in, binarized masks out); trace with floats and it expects
    [0,1]."""

    variables = {"params": params, "batch_stats": batch_stats}

    def serve(images):
        return serve_body(model, variables, images, threshold, tta=tta)

    return serve


def export_serving(model, params: Any, batch_stats: Any, batch: int,
                   size: int, in_channels: int = 1,
                   threshold: float = 0.5, fold_bn: bool = False,
                   input_dtype=jnp.float32, tta: bool = False) -> bytes:
    """Serialize the inference function (weights baked in) for the input
    shape (batch, size, size, in_channels). ``fold_bn=True`` folds
    BatchNorm into the conv kernels first (train/fold_bn.py) so the
    exported graph carries no normalization arithmetic."""
    if fold_bn:
        from ddti_tpu.train.fold_bn import fold_batchnorm
        params, batch_stats = fold_batchnorm(model, params, batch_stats)
    serve = make_serve_fn(model, params, batch_stats, threshold, tta=tta)
    spec = jax.ShapeDtypeStruct((batch, size, size, in_channels),
                                input_dtype)
    exported = jax_export.export(jax.jit(serve))(spec)
    return exported.serialize()


def _cast_floating(tree, dtype):
    """Cast floating-point leaves (weights) to ``dtype`` — serving needs no
    f32 master copies; bf16 weights halve the per-step weight prefetch
    traffic and remove the f32->bf16 converts from every conv fusion."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


def export_program(serve, variables, batch: int, size: int,
                   in_channels: int = 1, input_dtype=jnp.float32,
                   mesh=None) -> bytes:
    """THE weights-as-arguments export tail, shared by every program
    exporter (plain, sharded, int8 in train/quantize.py): serialize
    ``serve(variables, images)`` as StableHLO for the image shape
    ``(batch, size, size, in_channels)``.

    With ``mesh``, the program carries GSPMD shardings — ``variables``
    replicated, the image batch sharded over the mesh's ``data`` axis —
    and ``batch`` is the GLOBAL batch (must divide by
    ``mesh.shape['data']``; jax.export validates device counts at call
    time)."""
    spec_kw, img_kw, jit_kw = {}, {}, {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        dp = NamedSharding(mesh, PartitionSpec("data"))
        spec_kw = dict(sharding=rep)
        img_kw = dict(sharding=dp)
        jit_kw = dict(in_shardings=(jax.tree.map(lambda _: rep, variables),
                                    dp),
                      out_shardings=dp)
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype,
                                       **spec_kw), variables)
    img_spec = jax.ShapeDtypeStruct((batch, size, size, in_channels),
                                    input_dtype, **img_kw)
    exported = jax_export.export(jax.jit(serve, **jit_kw))(var_specs,
                                                           img_spec)
    return exported.serialize()


def _serving_variables(model, params, batch_stats, fold_bn,
                       weights_dtype) -> dict:
    if fold_bn:
        from ddti_tpu.train.fold_bn import fold_batchnorm
        params, batch_stats = fold_batchnorm(model, params, batch_stats)
    if weights_dtype is not None:
        params = _cast_floating(params, weights_dtype)
        batch_stats = _cast_floating(batch_stats, weights_dtype)
    return {"params": params, "batch_stats": batch_stats}


def export_serving_program(model, params: Any, batch_stats: Any, batch: int,
                           size: int, in_channels: int = 1,
                           threshold: float = 0.5, fold_bn: bool = False,
                           input_dtype=jnp.float32,
                           weights_dtype=None,
                           tta: bool = False) -> tuple[bytes, dict]:
    """Weights-as-ARGUMENTS export: returns ``(blob, variables)`` where the
    StableHLO program takes ``(variables, images)``. This is the
    production split — a small program artifact plus a weight bundle —
    and the only loadable form at flagship scale here: baking 130M f32
    params into the module as constants exceeds the remote-compile
    tunnel's request limit (HTTP 413). Use ``export_serving`` (baked) for
    small models / self-contained artifacts."""
    variables = _serving_variables(model, params, batch_stats, fold_bn,
                                   weights_dtype)

    def serve(variables, images):
        return serve_body(model, variables, images, threshold, tta=tta)

    return export_program(serve, variables, batch, size, in_channels,
                          input_dtype), variables


def ensemble_serve_body(model, stacked_variables, images,
                        threshold: float = 0.5, tta: bool = False):
    """Serving computation for a K-member same-architecture ensemble:
    member variable trees stacked on a leading axis, ONE vmapped forward,
    probability mean, threshold. The deployable form of the infer CLI's
    ``--checkpoint a,b,c`` vote (e.g. k-fold models)."""
    if images.dtype == jnp.uint8:
        compute = getattr(model, "dtype", None) or jnp.float32
        images = images.astype(compute) / 255.0

    def member_probs(variables):
        def fwd(im):
            out = model.apply(variables, im, train=False)
            return out[0] if isinstance(out, tuple) else out

        if tta:
            from ddti_tpu.eval.tta import tta_probs
            return tta_probs(fwd, images)
        return jax.nn.sigmoid(fwd(images).astype(jnp.float32))

    probs = jax.vmap(member_probs)(stacked_variables).mean(axis=0)
    return (probs > threshold).astype(jnp.uint8)


def export_serving_ensemble(model, members: list, batch: int, size: int,
                            in_channels: int = 1, threshold: float = 0.5,
                            fold_bn: bool = False,
                            input_dtype=jnp.float32, weights_dtype=None,
                            tta: bool = False) -> tuple[bytes, dict]:
    """Weights-as-arguments export of a K-member ensemble bundle.
    ``members`` is a list of ``(params, batch_stats)`` pairs of the SAME
    architecture (e.g. the K fold models from a k-fold training); the
    program takes the stacked variable tree + images and emits the
    probability-mean-voted masks. Returns ``(blob, stacked_variables)`` —
    same artifact form as ``export_serving_program``, loadable by the
    infer CLI / serve daemon / ``load_serving_bundle`` unchanged."""
    trees = [_serving_variables(model, p, s, fold_bn, weights_dtype)
             for p, s in members]
    variables = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    def serve(variables, images):
        return ensemble_serve_body(model, variables, images, threshold,
                                   tta=tta)

    return export_program(serve, variables, batch, size, in_channels,
                          input_dtype), variables


def export_serving_sharded(model, params: Any, batch_stats: Any, mesh,
                           batch: int, size: int, in_channels: int = 1,
                           threshold: float = 0.5, fold_bn: bool = False,
                           input_dtype=jnp.float32,
                           weights_dtype=None,
                           tta: bool = False) -> tuple[bytes, dict]:
    """Multi-chip serving export: the StableHLO program carries GSPMD
    shardings — weights replicated, the image batch sharded over the
    mesh's ``data`` axis — so one deserialized artifact serves a batch
    across a whole slice (scale-out analogue of the reference's
    single-GPU ``Trainer.test()``). ``batch`` is the GLOBAL batch and must
    divide by ``mesh.shape['data']``.

    Returns ``(blob, variables)`` in the weights-as-arguments form; call
    the deserialized program on a mesh of the same shape."""
    variables = _serving_variables(model, params, batch_stats, fold_bn,
                                   weights_dtype)

    def serve(variables, images):
        return serve_body(model, variables, images, threshold, tta=tta)

    return export_program(serve, variables, batch, size, in_channels,
                          input_dtype, mesh=mesh), variables


def load_serving(blob: bytes):
    """Rehydrate a serialized artifact into a callable."""
    exported = jax_export.deserialize(blob)
    return exported.call


def aot_compile_serving(blob: bytes):
    """Deserialize AND ahead-of-time compile the artifact for its exported
    input shapes; returns the loaded executable (a jax Compiled object —
    no Python model code, no retracing at call time). Works for both the
    baked-weights and weights-as-arguments artifact forms."""
    exported = jax_export.deserialize(blob)
    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype)
             for a in exported.in_avals]
    args, kwargs = jax.tree.unflatten(exported.in_tree, specs)
    return jax.jit(exported.call).lower(*args, **kwargs).compile()


def load_serving_bundle(program_path: str, weights_path: str | None = None,
                        shared_variables=None):
    """Rehydrate a weights-as-arguments serving bundle (the pair
    ``--export_serving`` writes: ``<model>_serving_program.stablehlo`` +
    sibling ``.npz``) into ``(fn, batch, size, in_dtype)`` where
    ``fn(images[batch, size, size, C]) -> uint8 masks`` is an AOT-compiled
    executable with the weights closed over — no model code involved.

    Baked-weights artifacts (single input) are accepted too; ``weights_path``
    is then ignored. For two-input programs ``weights_path`` defaults to the
    program path with ``.stablehlo`` swapped for ``.npz``.

    SHARDED artifacts (``export_serving_sharded`` /
    ``export_serving_int8_sharded``, ``nr_devices > 1``) are served over a
    ``data``-axis mesh built from the first ``nr_devices`` local devices;
    weights are replicated and the (global) image batch is sharded —
    ``fn`` still takes/returns ordinary host arrays.

    ``shared_variables``: the already-device-resident variable tree of a
    PREVIOUSLY loaded bundle of the same model (``fn.variables``) — used
    when it matches this program's template exactly, so a multi-batch
    bundle set (the same weights exported at batch 1/8/32) holds ONE
    copy of the weights in HBM instead of one per program. The returned
    ``fn`` exposes its tree as ``fn.variables`` (None for baked-weights
    artifacts)."""
    import os

    from jax import export as jax_export

    with open(program_path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    put_rep = put_dp = jax.device_put
    if exported.nr_devices > 1:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec
        devs = jax.devices()
        if len(devs) < exported.nr_devices:
            raise ValueError(
                f"sharded serving artifact needs {exported.nr_devices} "
                f"devices; only {len(devs)} available")
        import numpy as np
        mesh = Mesh(np.array(devs[: exported.nr_devices]), ("data",))
        rep = NamedSharding(mesh, PartitionSpec())
        dp = NamedSharding(mesh, PartitionSpec("data"))
        put_rep = lambda t: jax.device_put(t, rep)       # noqa: E731
        put_dp = lambda t: jax.device_put(t, dp)         # noqa: E731

    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype)
             for a in exported.in_avals]
    args, kwargs = jax.tree.unflatten(exported.in_tree, specs)
    if exported.nr_devices > 1:
        # lower with the mesh placement the program was exported for:
        # weights (all leading args) replicated, the image batch sharded
        args = tuple(
            jax.tree.map(lambda a: jax.ShapeDtypeStruct(
                a.shape, a.dtype,
                sharding=dp if i == len(args) - 1 else rep), arg)
            for i, arg in enumerate(args))
    compiled = jax.jit(exported.call).lower(*args, **kwargs).compile()

    if len(args) == 1:  # baked weights: fn(images)
        img_spec = args[0]

        def fn(images):
            return compiled(put_dp(jnp.asarray(images)))

        fn.variables = None
    else:  # weights-as-arguments: fn(variables, images)
        var_template, img_spec = args
        variables = None
        if shared_variables is not None:
            try:  # reuse iff structure+shape+dtype match this template
                match = jax.tree.all(jax.tree.map(
                    lambda t, v: (t.shape == jnp.shape(v)
                                  and t.dtype == jnp.asarray(v).dtype),
                    var_template, shared_variables))
                if match:
                    variables = shared_variables
            except (ValueError, TypeError):
                pass  # different tree structure: load our own
        if variables is None:
            if weights_path is None:
                base, _ = os.path.splitext(program_path)
                weights_path = base + ".npz"
            from ddti_tpu.train.checkpoint import load_variables_npz
            # the template carries whatever collections the program was
            # exported with (params/batch_stats, plus e.g. "quant" for
            # int8 bundles)
            variables = put_rep(load_variables_npz(weights_path,
                                                   var_template))

        def fn(images):
            return compiled(variables, put_dp(jnp.asarray(images)))

        fn.variables = variables

    batch, size = img_spec.shape[0], img_spec.shape[1]
    return fn, batch, size, img_spec.dtype


def save_serving(path: str, model, params, batch_stats, batch: int,
                 size: int, **kw) -> None:
    with open(path, "wb") as f:
        f.write(export_serving(model, params, batch_stats, batch, size,
                               **kw))


def load_serving_file(path: str):
    with open(path, "rb") as f:
        return load_serving(f.read())
