"""Checkpointing.

Preserves the reference checkpoint *contract* (reference train.py:200-217 /
test_sample.py:49-62): a checkpoint embeds the full training config, loss
history and seed, and the generator is reconstructed from the stored config
at load time. Beyond the reference (save-only), checkpoints here also carry
optimizer and EMA state for true resume.

Format: a single msgpack file via flax.serialization (framework-native,
torch-free). Reference ``.pth`` checkpoints load transparently through the
torch importer, so trained reference models run on TPU unchanged.
"""

from __future__ import annotations

import copy
import json
import os
import queue
import struct
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

MAGIC = b"ITGTPU1\n"


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """payload: arbitrary dict of pytrees + JSON-serialisable metadata under
    the 'meta' key.

    ``to_state_dict`` first: msgpack cannot pack tuples/NamedTuples (optax
    optimizer states are tuples of NamedTuples); the state-dict form is pure
    nested dicts. Loaders that need the original structure restore it with
    ``serialization.from_state_dict`` against a template pytree.
    """
    meta = payload.pop("meta", {})
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(_to_numpy_tree(payload))
    )
    meta_blob = json.dumps(meta).encode()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(meta_blob)))
        f.write(meta_blob)
        f.write(blob)


@jax.jit
def _device_snapshot(tree):
    # Fresh device buffers (without donation XLA never aliases an output to
    # a parameter), bit-identical to the input. One dispatch per submit.
    return jax.tree_util.tree_map(lambda x: x.copy(), tree)


class AsyncCheckpointer:
    """Background-thread checkpoint writer.

    Through the axon tunnel a blocking :func:`save_checkpoint` fetches every
    state leaf host-side one round trip at a time (~6 s per save, ~10 saves
    per 300-epoch run). ``submit`` snapshots the device arrays into FRESH
    device buffers (one jitted HBM copy — the train step is jitted with
    ``donate_argnums``, so the next dispatch invalidates the live
    ``TrainState`` buffers; holding bare references would turn every
    non-final save into an "Array has been deleted" error) and a single
    worker thread runs the D2H + serialize + file write while the main loop
    keeps dispatching steps.

    ``meta`` is deep-copied at submit time (the training loop mutates its
    loss-history lists in place). Saves are written in submission order by
    one worker, so a later epoch's file never races an earlier one. Call
    :meth:`wait` before reading a checkpoint back or returning from
    training. Worker errors re-raise at the NEXT :meth:`submit` or
    :meth:`wait` (whichever comes first), then clear, so one failed save
    does not poison a reused checkpointer.
    """

    def __init__(self) -> None:
        self._q: "queue.Queue" = queue.Queue()
        self._errors: list = []
        self._thread: Optional[threading.Thread] = None

    def _worker(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            path, payload = item
            try:
                save_checkpoint(path, payload)
            except Exception as e:  # surfaced by submit()/wait()
                self._errors.append(e)

    def _raise_pending(self) -> None:
        if self._errors:
            err, self._errors = self._errors[0], []
            raise err

    def submit(self, path: str, payload: Dict[str, Any]) -> None:
        self._raise_pending()
        meta = None
        if "meta" in payload:
            payload = dict(payload)
            meta = copy.deepcopy(payload.pop("meta"))
        # Snapshot device leaves BEFORE the caller dispatches the next
        # (donating) train step: dispatched from the same thread, the copy
        # program is ordered ahead of the donation on the device stream.
        payload = _device_snapshot(payload)
        if meta is not None:
            payload["meta"] = meta
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker, daemon=True)
            self._thread.start()
        self._q.put((path, payload))

    def wait(self) -> None:
        """Block until all submitted saves are on disk; re-raise any error."""
        if self._thread is not None:
            self._q.put(None)
            self._thread.join()
            self._thread = None
        self._raise_pending()


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a framework checkpoint OR a reference torch .pth checkpoint.

    Returns a dict with 'meta' (config etc.) and the stored pytrees. For
    .pth files, returns {'meta': {'args': ...}, 'torch_state_dicts': {...}}
    for the callers to convert via utils.torch_import.
    """
    with open(path, "rb") as f:
        head = f.read(len(MAGIC))
        if head == MAGIC:
            (meta_len,) = struct.unpack("<Q", f.read(8))
            meta = json.loads(f.read(meta_len).decode())
            tree = serialization.msgpack_restore(f.read())
            tree["meta"] = meta
            return tree
    # fall through: torch checkpoint
    from infinite_texture_gans_tpu.utils.torch_import import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    args = ckpt.get("args")
    meta: Dict[str, Any] = {}
    if args is not None:
        meta["args"] = {k: v for k, v in vars(args).items()}
    for k in ("epoch", "seed", "Gloss", "Dloss"):
        if k in ckpt:
            meta[k] = ckpt[k]
    out: Dict[str, Any] = {"meta": meta, "torch_state_dicts": {}}
    for k in ("netG_state_dict", "netD_state_dict"):
        if k in ckpt:
            out["torch_state_dicts"][k] = ckpt[k]
    return out


def restore_train_state(state, ckpt: Dict[str, Any], steps_per_epoch: int = 0):
    """Restore a full TrainState from a framework checkpoint (true resume —
    a capability the reference lacks, SURVEY.md §5). ``state`` is a freshly
    initialised TrainState used as the structure template; stored state-dict
    trees are mapped back onto it (tuple-structured optax states included).
    The step counter is rebuilt as epoch * steps_per_epoch so step-dependent
    logic (LR schedules) continues where it left off."""
    import jax.numpy as jnp

    from infinite_texture_gans_tpu.train.train_step import TrainState

    g_vars = dict(ckpt["netG_variables"])
    d_vars = dict(ckpt["netD_variables"])
    params_G = serialization.from_state_dict(state.params_G, g_vars.pop("params"))
    params_D = serialization.from_state_dict(state.params_D, d_vars.pop("params"))
    aux_G = serialization.from_state_dict(state.aux_G, g_vars)
    aux_D = serialization.from_state_dict(state.aux_D, d_vars)
    opt_G = serialization.from_state_dict(state.opt_G, ckpt["opt_G"])
    opt_D = serialization.from_state_dict(state.opt_D, ckpt["opt_D"])
    ema = state.ema
    if state.ema is not None and ckpt.get("ema"):
        ema = serialization.from_state_dict(state.ema, ckpt["ema"])
    epoch = int(ckpt["meta"].get("epoch", 0))
    steps_done = jnp.asarray(epoch * steps_per_epoch, state.step.dtype)
    return TrainState(
        params_G=params_G,
        aux_G=aux_G,
        params_D=params_D,
        aux_D=aux_D,
        opt_G=opt_G,
        opt_D=opt_D,
        ema=ema,
        step=steps_done,
    ), epoch


def load_netG(path: str, ema: Optional[bool] = None):
    """API-parity alias of :func:`load_generator_from_checkpoint`
    (reference utils.py:616-634 load_netG)."""
    return load_generator_from_checkpoint(path, ema)


def load_generator_from_checkpoint(
    path: str, ema: Optional[bool] = None, *, ckpt: Optional[Dict[str, Any]] = None
):
    """Rebuild a generator (module + variables) from any checkpoint,
    reproducing the reference's config-from-checkpoint flow
    (test_sample.py:51-62). Returns (gen_module, variables, args_namespace).

    Only the MODULE is rebuilt SN-off (reference test_sample.py:55-58); the
    returned variables are the checkpoint's raw tree — for a ``--spec_norm_G``
    training checkpoint that includes the ``spectral`` u/v collection, which
    the SN-off module ignores at apply time and ``utils.torch_export`` maps
    back to torch SN buffers.

    ``ckpt``: optionally pass an already-:func:`load_checkpoint`-ed dict to
    avoid deserializing the file twice (e.g. the CLI's ``--export_pth`` path
    also needs the raw optimizer/D trees)."""
    from infinite_texture_gans_tpu.config import dict_to_args, generator_kwargs
    from infinite_texture_gans_tpu.models.generator import ResidualPatchGenerator

    if ckpt is None:
        ckpt = load_checkpoint(path)
    args = dict_to_args(ckpt["meta"]["args"])
    # inference always rebuilds with SN off and the default 3x3 grid
    # (reference test_sample.py:55-58)
    kwargs = generator_kwargs(args)
    kwargs.update(SN=False, num_patches_h=3, num_patches_w=3)
    gen = ResidualPatchGenerator(**kwargs)

    if "torch_state_dicts" in ckpt:
        from infinite_texture_gans_tpu.utils.torch_import import import_generator

        variables = import_generator(
            ckpt["torch_state_dicts"]["netG_state_dict"],
            n_layers_G=args.n_layers_G,
            type_norm=args.type_norm_G,
            attention=args.attention,
        )
    else:
        if ema and "ema" in ckpt and ckpt["ema"]:
            variables = {
                "params": ckpt["ema"]["params"],
                "batch_stats": ckpt["ema"]["batch_stats"],
            }
        else:
            variables = ckpt["netG_variables"]
    return gen, variables, args
