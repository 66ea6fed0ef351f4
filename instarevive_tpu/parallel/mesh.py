"""Device mesh + sharding: the TPU-native replacement for the reference's
NCCL DDP/FSDP stack.

Parity target (by capability, not mechanism): reference
``diffusion/utils/dist_utils.py:1-314`` (torch.distributed/NCCL collectives),
HF Accelerate DDP (``test_scripts/test_controlnet.py:464-471``) and FSDP
(TRANSFORMER_BASED_WRAP on PixArtBlock, ``test_controlnet.py:66-70``).

TPU design: one ``jax.sharding.Mesh`` with axes ``('data', 'fsdp')``.
Data parallelism = batch sharded on 'data'. FSDP/ZeRO-3 = every parameter
(and its optimizer state) sharded on 'fsdp' along its largest divisible
axis; XLA inserts all-gathers before use and reduce-scatters for grads —
the collectives ride ICI automatically. The reference's hand-written
``all_gather``/``reduce_dict``/``GatherLayer`` helpers collapse into
``NamedSharding`` annotations (gathers are differentiable natively in JAX).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'fsdp'[, 'tensor']) mesh. data=-1 = all remaining devices.

    The 'tensor' axis (only materialized when tensor > 1, keeping the
    2-axis mesh signature for all existing DP/FSDP paths) carries
    Megatron-style tensor parallelism — see ``parallel/tp.py``. It is
    innermost so TP collectives ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (fsdp * tensor):
            raise ValueError(f"{n} devices not divisible by fsdp*tensor={fsdp * tensor}")
        data = n // (fsdp * tensor)
    if tensor > 1:
        arr = np.asarray(devices[: data * fsdp * tensor]).reshape(data, fsdp, tensor)
        return Mesh(arr, ("data", "fsdp", "tensor"))
    arr = np.asarray(devices[: data * fsdp]).reshape(data, fsdp)
    return Mesh(arr, ("data", "fsdp"))


def param_sharding_rules(path_leaf, mesh: Mesh) -> NamedSharding:
    """FSDP rule: shard the largest axis divisible by the fsdp size.

    Equivalent in effect to the reference's TRANSFORMER_BASED_WRAP FSDP
    (per-block full shard): every weight is evenly split across the fsdp
    axis; scalars/small vectors stay replicated.
    """
    leaf = path_leaf
    size = mesh.shape["fsdp"]
    if size == 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
        return NamedSharding(mesh, P())
    # pick the largest divisible dim (prefer later dims for conv HWIO -> O)
    best, best_dim = None, -1
    for i, d in enumerate(leaf.shape):
        if d % size == 0 and d >= best_dim:
            best, best_dim = i, d
    if best is None or best_dim < size:
        return NamedSharding(mesh, P())
    spec = [None] * leaf.ndim
    spec[best] = "fsdp"
    return NamedSharding(mesh, P(*spec))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree with FSDP sharding (host->device)."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, param_sharding_rules(leaf, mesh)), params
    )


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """The sharding tree (for jit in_shardings/out_shardings)."""
    return jax.tree_util.tree_map(lambda leaf: param_sharding_rules(leaf, mesh), params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading batch axis over ('data', 'fsdp') jointly — pure data
    parallelism from the batch's perspective; fsdp ranks see distinct
    microbatches too (ZeRO-style)."""
    sh = NamedSharding(mesh, P(("data", "fsdp")))
    return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, sh), batch)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def constrain_batch(x):
    """with_sharding_constraint over the ('data','fsdp') batch axis when a
    matching mesh is ambient; no-op otherwise (single-device tests / CLI).

    Used on small per-step activations whose sharding XLA otherwise leaves
    ambiguous — e.g. the PixArt adaLN t_block output, where an unconstrained
    layout triggered 'involuntary full rematerialization' resharding in the
    FSDP backward (round-1 dryrun warnings)."""
    from jax.sharding import PartitionSpec

    m = _ambient_mesh()
    if m is None:
        return x
    axes = tuple(a for a in ("data", "fsdp") if a in m.axis_names)
    if not axes:
        return x
    total = 1
    for a in axes:
        total *= dict(m.shape)[a]
    if total <= 1 or x.shape[0] % total:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(m, PartitionSpec(axes))
    )


def constrain_heads(x):
    """with_sharding_constraint over the head axis (dim 1 of (B, H, N, d))
    when an ambient mesh has a 'tensor' axis that divides H; no-op
    otherwise (single-device paths and DP/FSDP meshes are untouched).

    This is what actually splits the N² attention work under tensor
    parallelism: the qkv projections are computed redundantly (their
    packed layout can't be head-sharded — see ``parallel/tp.py``), and
    without an explicit constraint GSPMD's propagation is free to keep
    the whole attention replicated and only split the row-parallel
    ``proj`` matmul."""
    m = _ambient_mesh()
    if m is None or "tensor" not in m.axis_names:
        return x
    t = dict(m.shape)["tensor"]
    if t <= 1 or x.ndim != 4 or x.shape[1] % t:
        return x
    from jax.sharding import PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(m, PartitionSpec(None, "tensor", None, None))
    )


def _ambient_mesh() -> Optional[Mesh]:
    """The mesh made ambient by ``with mesh:``, or None.

    NOTE: ``jax.sharding.get_abstract_mesh()`` does NOT see a plain
    ``with mesh:`` context (it tracks ``jax.set_mesh``-style abstract
    meshes only — verified empty on jax 0.9.0, which made the round-1/2
    constrain_batch a silent no-op, exactly the failure mode ADVICE r2
    warned about). The ``with mesh:`` context registers on
    ``thread_resources.env.physical_mesh``; probe errors are narrowed to
    Import/AttributeError so a real regression stays visible."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
    except (ImportError, AttributeError):
        return None
    if m is None or m.empty or not m.axis_names:
        return None
    return m


@jax.custom_vjp
def replicate_grad(x):
    """Identity forward; backward constrains the cotangent to *replicated*
    over the ambient mesh.

    Use on small broadcast params (e.g. PixArt per-block scale_shift_table,
    reference ``PixArt_blocks.py`` adaLN tables) whose batch-reduced
    cotangent otherwise inherits a degenerate batch sharding (a size-1 dim
    sharded over all devices), which makes SPMD emit 'involuntary full
    rematerialization' resharding in the FSDP backward (round-2 dryrun
    warnings on ``transpose(jvp(PixArt))`` f32[1,6*D] reshapes)."""
    return x


def _replicate_grad_fwd(x):
    return x, None


def _replicate_grad_bwd(_, g):
    m = _ambient_mesh()
    if m is not None:
        from jax.sharding import PartitionSpec

        g = jax.lax.with_sharding_constraint(g, NamedSharding(m, PartitionSpec()))
    return (g,)


replicate_grad.defvjp(_replicate_grad_fwd, _replicate_grad_bwd)


def commit_states(states, mesh: Mesh):
    """Canonicalize a train-state tuple before entering the jitted loop.

    Three different entry paths produce three different jit signatures for
    the SAME logical state — fresh creation (some leaves weak-typed /
    uncommitted), the step function's own outputs (committed, strong), and
    checkpoint restore (host numpy) — which cost a full recompile each
    ("step-2 retrace"). This pins every leaf to the same contract the step
    outputs satisfy: strong dtypes, FSDP placement for tensors, replicated
    scalars.
    """
    import jax.numpy as jnp

    def fix(leaf):
        if isinstance(leaf, (int, float, np.ndarray, np.generic)) or (
            hasattr(leaf, "dtype") and not isinstance(leaf, jax.Array)
        ):
            leaf = jnp.asarray(leaf)
        if not isinstance(leaf, jax.Array):
            return leaf
        if getattr(leaf, "weak_type", False):
            leaf = leaf.astype(leaf.dtype)  # strong-type
        return jax.device_put(leaf, param_sharding_rules(leaf, mesh))

    return jax.tree_util.tree_map(fix, states)
