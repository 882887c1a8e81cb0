"""Pallas remote-DMA halo exchange with overlapped per-peer transfers.

A hand-rolled all-to-all over inter-chip DMA (``make_async_remote_copy``) as
the transport for the node-sharded halo exchange (parallel/node_shard.py).
Each device pushes the P rows it serves to peer ``o`` directly into slot
``my_id`` of ``o``'s receive buffer.

Overlap structure (the double-buffered pattern from the TPU kernel
playbook, VERDICT.md round-1 item 6): the kernel is generated from an
explicit schedule (:func:`halo_schedule`) that

1. **starts every per-peer RDMA first** — each peer pair uses its own
   send/recv semaphore slot, so all ``n-1`` transfers are in flight
   concurrently instead of the serial start/wait-per-peer of the round-1
   kernel (and instead of the bulk-synchronous barrier XLA's ``all_to_all``
   imposes);
2. **copies the local slot while the DMAs fly** — the only on-core work the
   exchange itself owns sits between the starts and the waits;
3. **waits per-peer in ring-staggered order** afterwards; consumers that
   need only peer ``k``'s rows could resume after wait ``k`` without
   fencing the rest.

The peer schedule is staggered by device id (device d's i-th transfer goes
to ``(d+1+i) % n``) so the ring is never hot-spotted: at every step each
device sends to a distinct peer and receives from a distinct peer, and the
shared semaphore slot ``i`` on the receiver is signaled by exactly one
sender (``(d-1-i) % n``), which is what wait ``i`` completes on.

Validated against ``lax.all_to_all`` in interpret mode on the simulated
mesh (tests/test_node_shard.py); the schedule ordering itself is locked by
tests/test_halo_schedule.py. On hardware the same code lowers to ICI RDMA.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def halo_schedule(n: int) -> List[Tuple[str, int]]:
    """The kernel's event order for an ``n``-device exchange.

    Returns ``[("start", 0), ..., ("start", n-2), ("local_copy", -1),
    ("wait", 0), ..., ("wait", n-2)]``: every remote transfer is issued
    before any completion wait, with the local work in between. The kernel
    body is generated from this list so the overlap structure cannot
    silently regress; tests assert the invariant on the list itself.
    """
    events: List[Tuple[str, int]] = [("start", i) for i in range(n - 1)]
    events.append(("local_copy", -1))
    events.extend(("wait", i) for i in range(n - 1))
    return events


def _halo_kernel(send_ref, out_ref, send_sem, recv_sem, *, axis_name: str,
                 n: int):
    my = jax.lax.axis_index(axis_name)

    rdmas = {}
    for kind, i in halo_schedule(n):
        if kind == "start":
            # Transfer i goes to peer (my+1+i) % n and lands in that peer's
            # out slot ``my``; semaphore slot i on the receiver is signaled
            # only by sender (my-1-i) % n, so slot use never collides.
            peer = jax.lax.rem(my + 1 + i, n)
            rdma = pltpu.make_async_remote_copy(
                src_ref=send_ref.at[pl.ds(peer, 1)],
                dst_ref=out_ref.at[pl.ds(my, 1)],
                send_sem=send_sem.at[i],
                recv_sem=recv_sem.at[i],
                device_id=peer,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            )
            rdma.start()
            rdmas[i] = rdma
        elif kind == "local_copy":
            # My own served rows: plain VMEM copy, overlapped with the
            # in-flight remote DMAs above.
            out_ref[pl.ds(my, 1)] = send_ref[pl.ds(my, 1)]
        else:  # wait
            rdmas[i].wait()


def pallas_halo_exchange(send: jnp.ndarray, axis_name: str,
                         *, interpret: bool = False) -> jnp.ndarray:
    """All-to-all of ``send [n_devices, P, D]`` (must run inside shard_map).

    Returns ``recv [n_devices, P, D]`` where ``recv[o]`` holds what device
    ``o`` sent to this device — identical semantics to
    ``lax.all_to_all(send, axis, split_axis=0, concat_axis=0, tiled=True)``.

    Differentiable: the exchange permutes blocks across devices
    (``recv_d[o] = send_o[d]``), so its linear transpose is the SAME
    exchange applied to the cotangents (``ct_send_o[d] = ct_recv_d[o]``) —
    the backward pass reuses the identical overlapped-RDMA kernel, which is
    what lets the node-sharded TRAIN step run with ``halo_impl="pallas"``.
    """
    return _exchange(send, axis_name, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _exchange(send: jnp.ndarray, axis_name: str,
              interpret: bool) -> jnp.ndarray:
    return _exchange_impl(send, axis_name, interpret)


def _exchange_fwd(send, axis_name, interpret):
    return _exchange(send, axis_name, interpret), None


def _exchange_bwd(axis_name, interpret, _res, ct):
    return (_exchange(ct, axis_name, interpret),)


_exchange.defvjp(_exchange_fwd, _exchange_bwd)


def _exchange_impl(send: jnp.ndarray, axis_name: str,
                   interpret: bool) -> jnp.ndarray:
    if jax.default_backend() == "cpu":
        interpret = True
    n = int(send.shape[0])
    kernel = functools.partial(_halo_kernel, axis_name=axis_name, n=n)
    # Under check_vma=True shard_maps the output aval must carry the same
    # varying-manual-axes set as the input (the exchange is per-device data).
    try:
        vma = jax.typeof(send).vma
    except Exception:  # outside shard_map / older JAX
        vma = None
    out_shape = (jax.ShapeDtypeStruct(send.shape, send.dtype, vma=vma)
                 if vma else jax.ShapeDtypeStruct(send.shape, send.dtype))
    n_sem = max(n - 1, 1)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_sem,)),
                        pltpu.SemaphoreType.DMA((n_sem,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=7),
        interpret=interpret,
    )(send)
