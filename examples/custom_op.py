"""Defining a custom Op the reference way (make_node/perform/grad) and
registering its XLA lowering — the c_code replacement workflow."""

import numpy as np

import jax.numpy as jnp

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.link.jax.dispatch import jax_funcify


class SoftShrink(Op):
    """soft-shrinkage: sign(x) * max(|x| - lambda, 0)"""

    __props__ = ("lambd",)

    def __init__(self, lambd: float = 0.5):
        self.lambd = float(lambd)

    def make_node(self, x):
        x = at.as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = np.sign(x) * np.maximum(
            np.abs(x) - self.lambd, 0.0
        ).astype(x.dtype)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        pass_through = at.math.gt(at.math.abs(x), self.lambd)
        return [gz * pass_through.astype(x.dtype)]


@jax_funcify.register(SoftShrink)
def _lower_softshrink(op, node=None, **kwargs):
    lam = op.lambd

    def impl(x):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam, 0.0)

    return impl


x = at.vector("x")
y = SoftShrink(0.5)(x)
f = atp.function([x], [y, atp.grad(y.sum(), x)])
xv = np.array([-2.0, -0.3, 0.1, 1.5], dtype="float32")
out, g = f(xv)
print("softshrink:", np.asarray(out))
print("grad      :", np.asarray(g))
assert np.allclose(out, [-1.5, 0.0, 0.0, 1.0])
assert np.allclose(g, [1.0, 0.0, 0.0, 1.0])
print("custom op OK")
