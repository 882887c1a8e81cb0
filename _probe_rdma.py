import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import functools
import jax.numpy as jnp
import numpy as np
from jax import shard_map as _sm
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()[:4]), ("x",))

def ring_kernel(x_ref, out_ref, comm_ref, send_sem, recv_sem):
    my = jax.lax.axis_index("x")
    n = jax.lax.axis_size("x")
    right = jax.lax.rem(my + 1, n)
    comm_ref[:] = x_ref[:]
    rdma = pltpu.make_async_remote_copy(
        src_ref=comm_ref, dst_ref=out_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rdma.start()
    rdma.wait()

def run(x):
    return pl.pallas_call(
        ring_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(x.shape, x.dtype),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=True,
        compiler_params=pltpu.CompilerParams(has_side_effects=True,
                                             collective_id=0),
    )(x)

f = jax.jit(_sm(run, mesh=mesh, in_specs=P("x"),
                                out_specs=P("x"), check_vma=False))
x = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4 * 8, 128)
out = f(x)
expected = jnp.roll(x.reshape(4, 8, 128), 1, axis=0).reshape(32, 128)
print("rdma interpret works:", np.allclose(np.asarray(out), np.asarray(expected)))
