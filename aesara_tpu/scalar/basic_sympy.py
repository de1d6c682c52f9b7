"""Wrap SymPy expressions as scalar ops (reference
``aesara/scalar/basic_sympy.py:117``).  SymPy is optional."""

from __future__ import annotations

from aesara_tpu.scalar.ops import ScalarOp, ScalarType, upgrade_to_float


class SymPyCCode(ScalarOp):
    """A scalar op defined by a SymPy expression of its inputs."""

    def __init__(self, inputs, expr, name=None):
        try:
            import sympy  # noqa: F401
        except ImportError as e:
            raise ImportError("SymPyCCode requires sympy") from e
        self.sympy_inputs = list(inputs)
        self.expr = expr
        self.nin = len(inputs)
        self.nout = 1
        self.name = name or f"sympy{{{expr}}}"
        self._fn = None

    output_types_preference = staticmethod(upgrade_to_float)

    def impl(self, *values):
        if self._fn is None:
            import sympy

            self._fn = sympy.lambdify(self.sympy_inputs, self.expr, "numpy")
        return self._fn(*values)

    def grad(self, inputs, output_grads):
        import sympy

        from aesara_tpu.scalar.ops import mul

        (gz,) = output_grads
        return [
            mul(gz, SymPyCCode(self.sympy_inputs, sympy.diff(self.expr, s))(*inputs))
            for s in self.sympy_inputs
        ]

    def __eq__(self, other):
        return type(other) is SymPyCCode and other.expr == self.expr

    def __hash__(self):
        return hash((SymPyCCode, str(self.expr)))
