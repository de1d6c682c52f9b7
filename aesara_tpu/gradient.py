"""Symbolic differentiation: reverse mode (``grad``/``Lop``), forward mode
(``Rop``), convenience builders (``jacobian``/``hessian``) and the numeric
checker ``verify_grad``.

Re-design of the reference's ``aesara/gradient.py`` (grad:427, Lop:359,
Rop:160, jacobian:1906, hessian:1994, verify_grad:1678,
DisconnectedType:121).  The algorithm is the reference's: connectivity
analysis cost→wrt, then a reverse-toposort walk calling each ``Op.L_op``
and accumulating terms (§3.5 of SURVEY.md).  ``Rop`` uses the
Lop-of-Lop ("double-backward") construction instead of per-op ``R_op``
when an op doesn't provide one.
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional, Sequence, Union

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.graph.ir import (
    Apply,
    Constant,
    Type,
    Variable,
    ancestors,
    applys_between,
    graph_inputs,
    io_toposort,
)
from aesara_tpu.graph.op import Op


__all__ = [
    "grad", "Lop", "Rop", "jacobian", "hessian", "subgraph_grad",
    "verify_grad", "numeric_grad", "GradientError",
    "DisconnectedType", "NullType", "disconnected_type", "null_type",
    "grad_undefined", "grad_not_implemented",
    "zero_grad", "disconnected_grad", "grad_clip", "grad_scale",
    "consider_constant", "UndefinedGrad", "DisconnectedGrad",
]


# ---------------------------------------------------------------------------
# marker types
# ---------------------------------------------------------------------------

class DisconnectedType(Type):
    """Type of gradients that are structurally zero (reference
    ``gradient.py:121``)."""

    def filter(self, data, strict=False, allow_downcast=None):
        return data

    def __eq__(self, other):
        return type(other) is DisconnectedType

    def __hash__(self):
        return hash(DisconnectedType)

    def __str__(self):
        return "DisconnectedType"


class NullType(Type):
    """Type of undefined/not-implemented gradients (reference
    ``graph/null_type.py``)."""

    def __init__(self, why_null: str = "(no explanation)"):
        self.why_null = why_null

    def filter(self, data, strict=False, allow_downcast=None):
        raise ValueError("NullType has no values")

    def __eq__(self, other):
        return type(other) is NullType

    def __hash__(self):
        return hash(NullType)

    def __str__(self):
        return "NullType"


disconnected_type = DisconnectedType()
null_type = NullType()


def grad_undefined(op, x_pos: int, x, comment: str = "") -> Variable:
    """Gradient is mathematically undefined (reference tail of gradient.py)."""
    return NullType(
        f"grad undefined for input {x_pos} of {op}: {comment}"
    )()


def grad_not_implemented(op, x_pos: int, x, comment: str = "") -> Variable:
    return NullType(
        f"grad not implemented for input {x_pos} of {op}: {comment}"
    )()


class GradientError(Exception):
    """verify_grad failure with details."""

    def __init__(self, arg, err_pos, shape, val1, val2, abs_err, rel_err,
                 abs_tol, rel_tol, ref_fn=None):
        super().__init__()
        self.args_ = (arg, err_pos, shape, val1, val2, abs_err, rel_err, abs_tol, rel_tol)

    def __str__(self):
        (arg, err_pos, shape, val1, val2, abs_err, rel_err, abs_tol, rel_tol) = self.args_
        return (
            f"GradientError: numeric gradient and symbolic gradient disagree "
            f"for argument {arg} at position {err_pos} (shape {shape}): "
            f"analytic={val1}, numeric={val2}, abs err={abs_err} (tol {abs_tol}), "
            f"rel err={rel_err} (tol {rel_tol})"
        )


def _is_disconnected(v) -> bool:
    return isinstance(getattr(v, "type", None), DisconnectedType)


def _is_null(v) -> bool:
    return isinstance(getattr(v, "type", None), NullType)


def _add_grads(a, b):
    if a is None:
        return b
    if b is None:
        return a
    if _is_null(a):
        return a
    if _is_null(b):
        return b
    if _is_disconnected(a):
        return b
    if _is_disconnected(b):
        return a
    from aesara_tpu.scalar.ops import ScalarType, add as s_add
    from aesara_tpu.tensor.math import add as t_add

    if isinstance(a.type, ScalarType):
        return s_add(a, b)
    from aesara_tpu.sparse.type import SparseTensorType

    if isinstance(a.type, SparseTensorType) or isinstance(b.type, SparseTensorType):
        from aesara_tpu.sparse.basic import add as sp_add

        return sp_add(a, b)
    return t_add(a, b)


def _ones_like_cost(cost):
    from aesara_tpu.tensor.basic import ones_like
    from aesara_tpu.scalar.ops import ScalarType, constant as s_constant, second as s_second

    dtype = cost.type.dtype
    if dtype.startswith(("int", "uint")) or dtype == "bool":
        dtype = config.floatX
    if isinstance(cost.type, ScalarType):
        return s_second(cost, s_constant(1.0, dtype=dtype))
    return ones_like(cost, dtype=dtype)


# ---------------------------------------------------------------------------
# the reverse-mode engine
# ---------------------------------------------------------------------------

def grad(
    cost: Optional[Variable],
    wrt,
    consider_constant: Optional[Sequence[Variable]] = None,
    disconnected_inputs: str = "raise",
    add_names: bool = True,
    known_grads: Optional[dict] = None,
    return_disconnected: str = "zero",
    null_gradients: str = "raise",
):
    """∂cost/∂wrt by reverse accumulation (reference ``gradient.py:427``)."""
    if cost is None and not known_grads:
        raise ValueError("grad needs a cost or known_grads")
    if cost is not None and isinstance(cost.type, NullType):
        raise ValueError(f"cost is undefined: {cost.type.why_null}")
    if cost is not None and cost.type.ndim != 0:
        raise TypeError("cost must be a scalar (0-d) variable")

    single = not isinstance(wrt, (list, tuple))
    wrt_list = [wrt] if single else list(wrt)
    for w in wrt_list:
        if not isinstance(w, Variable):
            raise TypeError(f"wrt elements must be Variables, got {type(w)}")

    grad_dict: dict = {}
    end_points = []
    if cost is not None:
        grad_dict[cost] = _ones_like_cost(cost)
        end_points.append(cost)
    for var, g in (known_grads or {}).items():
        g = var.type.filter_variable(g, allow_convert=True) if not _is_disconnected(g) else g
        grad_dict[var] = _add_grads(grad_dict.get(var), g)
        end_points.append(var)

    # connectivity: vars that reach wrt (forward) — prune irrelevant subtrees
    cc = set(consider_constant or [])
    relevant_nodes = io_toposort(
        [],
        end_points,
    )
    # vars from which some wrt is reachable going backwards == vars on a
    # path between wrt and the cost.  Compute "influences wrt" set:
    influences: set = set(wrt_list)
    for node in relevant_nodes:  # forward order
        if any(i in influences for i in node.inputs) and not all(
            o in cc for o in node.outputs
        ):
            influences.update(node.outputs)

    for node in reversed(relevant_nodes):
        outs_with_grad = [o for o in node.outputs if o in grad_dict]
        if not outs_with_grad:
            continue
        if not any(i in influences for i in node.inputs):
            continue
        ograds = []
        for o in node.outputs:
            if o in cc:
                # consider_constant: the var still RECEIVES gradient
                # (it may be in wrt — subgraph_grad relies on this), but
                # nothing flows THROUGH it to the node's inputs
                ograds.append(disconnected_type())
                continue
            g = grad_dict.get(o)
            if g is None:
                # structurally unused output: zero (continuous) / disconnected
                from aesara_tpu.scalar.ops import discrete_dtypes

                dt = getattr(o.type, "dtype", None)
                if dt is None or dt in discrete_dtypes:
                    g = disconnected_type()
                else:
                    g = o.zeros_like() if hasattr(o, "zeros_like") else disconnected_type()
            ograds.append(g)
        if all(_is_disconnected(g) for g in ograds):
            continue
        if any(_is_null(g) for g in ograds):
            # propagate nullity to all connected inputs
            null = next(g for g in ograds if _is_null(g))
            for inp in node.inputs:
                if inp in influences:
                    grad_dict[inp] = _add_grads(grad_dict.get(inp), null)
            continue
        try:
            igrads = node.op.L_op(node.inputs, node.outputs, ograds)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"{node.op} has no gradient: {e}"
            ) from e
        if len(igrads) != len(node.inputs):
            raise ValueError(
                f"{node.op}.L_op returned {len(igrads)} gradients for "
                f"{len(node.inputs)} inputs"
            )
        # edge-level connectivity: an input slot only receives gradient
        # through outputs it is CONNECTED to (op.connection_pattern) that
        # themselves carry a real gradient — a slot whose every connected
        # output has zero/disconnected ograd stays out of grad_dict, so
        # wrt it is reported disconnected (reference uses the pattern in
        # its connectivity walk, gradient.py:1029)
        pattern = None
        if hasattr(node.op, "connection_pattern"):
            try:
                pattern = node.op.connection_pattern(node)
            except Exception:
                pattern = None
        live = [o in grad_dict and not _is_disconnected(grad_dict[o])
                for o in node.outputs]
        for slot, (inp, ig) in enumerate(zip(node.inputs, igrads)):
            if ig is None or _is_disconnected(ig):
                continue
            if pattern is not None and not any(
                pattern[slot][j] for j in range(len(live)) if live[j]
            ):
                continue
            if inp not in influences and inp not in cc:
                continue
            dt = getattr(inp.type, "dtype", None)
            if dt is not None:
                from aesara_tpu.scalar.ops import discrete_dtypes

                if dt in discrete_dtypes:
                    if _is_null(ig):
                        # an undefined-grad marker must not poison the
                        # walk through a discrete var
                        continue
                    # a DEFINED gradient into a discrete var is
                    # structurally zero, but the var stays CONNECTED:
                    # keep a zero flowing upstream so e.g. the imatrix
                    # behind a tensor_copy resolves to zeros(floatX)
                    # rather than a disconnected error, while an
                    # undefined grad further up (argmax) still raises
                    if inp not in grad_dict:
                        grad_dict[inp] = _zeros_like_var(inp)
                    continue
            grad_dict[inp] = _add_grads(grad_dict.get(inp), ig)

    # assemble results
    results = []
    for w in wrt_list:
        g = grad_dict.get(w)
        if g is None or _is_disconnected(g):
            if g is None:
                if disconnected_inputs == "raise":
                    raise ValueError(
                        f"grad: input {w} is disconnected from the cost"
                    )
                if disconnected_inputs == "warn":
                    warnings.warn(f"grad: input {w} is disconnected")
            if return_disconnected.lower() == "zero":
                g = _zeros_like_var(w)
            elif return_disconnected.lower() == "none":
                g = None
            else:
                g = disconnected_type()
        elif _is_null(g):
            if null_gradients == "raise":
                raise NullTypeGradError(
                    f"grad encountered a NaN-producing/undefined gradient: "
                    f"{g.type.why_null}"
                )
        if add_names and g is not None and cost is not None and getattr(w, "name", None):
            cost_name = cost.name or "cost"
            try:
                g.name = f"(d{cost_name}/d{w.name})"
            except AttributeError:
                pass
        results.append(g)
    return results[0] if single else results


class NullTypeGradError(TypeError):
    """An undefined gradient was requested."""


def _zeros_like_var(w):
    from aesara_tpu.scalar.ops import ScalarType, constant as s_constant, second as s_second

    if isinstance(w.type, ScalarType):
        return s_second(w, s_constant(0.0, dtype=w.type.dtype))
    if hasattr(w, "zeros_like"):
        dtype = w.type.dtype
        if dtype.startswith(("int", "uint")) or dtype == "bool":
            dtype = config.floatX
        return w.zeros_like(dtype=dtype)
    return disconnected_type()


def Lop(f, wrt, eval_points, consider_constant=None, disconnected_inputs="raise"):
    """L-operator: v^T (df/dx) — grad with known output grads
    (reference ``gradient.py:359``)."""
    if not isinstance(f, (list, tuple)):
        f, eval_points = [f], [eval_points]
    known = dict(zip(f, eval_points))
    return grad(
        cost=None,
        wrt=wrt,
        known_grads=known,
        consider_constant=consider_constant,
        disconnected_inputs=disconnected_inputs,
    )


def _rop_via_op_rop(fs, wrts, evs):
    """Forward-mode traversal calling each ``Op.R_op`` (the reference's
    Rop mechanism, ``gradient.py:160``): walk input→output propagating
    tangents; ops touched by no tangent are skipped."""
    tangents: dict = {}
    for w, ev in zip(wrts, evs):
        if not (isinstance(ev, Variable) and ev.type == w.type):
            ev = w.type.filter_variable(ev, allow_convert=True)
        tangents[w] = ev
    for node in io_toposort(graph_inputs(fs), fs):
        if not any(i in tangents for i in node.inputs):
            continue
        eval_points = [tangents.get(i) for i in node.inputs]
        try:
            rops = node.op.R_op(node.inputs, eval_points)
        except NotImplementedError as e:
            raise NotImplementedError(
                f"{node.op} has no R_op rule (forward mode); use the "
                f"default double-backward Rop (use_op_rop=False)"
            ) from e
        for out, r in zip(node.outputs, rops):
            if r is not None:
                tangents[out] = out.type.filter_variable(
                    r, allow_convert=True
                )
    return [tangents.get(f) for f in fs]  # None = disconnected


def _apply_disconnected_output_policy(results, fs, policy, zeros_fn):
    """Shared raise/warn/zeros handling for Rop outputs no tangent can
    reach — one implementation for both the Lop-of-Lop and the
    per-op-R_op paths (review finding: the two copies could drift)."""
    for i, (fi, r) in enumerate(zip(fs, results)):
        if r is None or _is_disconnected(r):
            if policy == "raise":
                raise DisconnectedInputError(
                    f"Rop: output {fi} is not connected to any wrt"
                )
            if policy == "warn":
                warnings.warn(
                    f"Rop: output {fi} is not connected to any wrt"
                )
            results[i] = zeros_fn(fi)
    return results


def Rop(f, wrt, eval_points, disconnected_outputs="raise",
        use_op_rop=False):
    """R-operator: (df/dx) v.

    Default: the Lop-of-Lop ("double-backward") construction — it is
    algebraically identical to forward mode and needs no per-op rules.
    ``use_op_rop=True`` instead walks the graph forward calling each
    ``Op.R_op`` (the reference's mechanism), including a native
    forward-mode Scan."""
    single = not isinstance(f, (list, tuple))
    fs = [f] if single else list(f)
    wrts = [wrt] if not isinstance(wrt, (list, tuple)) else list(wrt)
    evs = [eval_points] if not isinstance(eval_points, (list, tuple)) else list(eval_points)

    if len(evs) != len(wrts):
        raise ValueError(
            f"Rop: {len(wrts)} wrt variables but {len(evs)} eval points"
        )

    if use_op_rop:
        from aesara_tpu.tensor.basic import zeros_like as _zl

        results = _apply_disconnected_output_policy(
            _rop_via_op_rop(fs, wrts, evs), fs, disconnected_outputs, _zl)
        return results[0] if single else results

    # dummy cotangents u, one per output
    us = []
    for fi in fs:
        u = fi.type()
        u.name = "rop_dummy_u"
        us.append(u)
    gs = grad(
        cost=None, wrt=wrts, known_grads=dict(zip(fs, us)),
        disconnected_inputs="ignore", return_disconnected="zero",
    )
    if not isinstance(gs, (list, tuple)):
        gs = [gs]
    # inner = sum_i <g_i, v_i>; then R = d inner / d u
    from aesara_tpu.tensor.math import sum as tsum, mul as tmul, add as tadd

    inner = None
    for g, v in zip(gs, evs):
        v = g.type.filter_variable(v, allow_convert=True) if not isinstance(v, Variable) or v.type != g.type else v
        term = tsum(tmul(g, v)) if g.type.ndim else tmul(g, v)
        inner = term if inner is None else tadd(inner, term)
    rops = grad(
        cost=None, wrt=us,
        known_grads={inner: _ones_like_cost(inner)},
        disconnected_inputs="ignore",
        return_disconnected="disconnected",
    )
    if not isinstance(rops, (list, tuple)):
        rops = [rops]
    # honor the disconnected_outputs policy on the default path too: an
    # output whose dummy cotangent u_i never reaches <g, v> is an output
    # no tangent can touch
    rops = _apply_disconnected_output_policy(
        rops, fs, disconnected_outputs, _zeros_like_var)
    # the result is linear in u and value-independent of it, but broadcast
    # templates (fill/second) can still reference u syntactically —
    # substitute a zero of the right shape
    from aesara_tpu.graph.ir import clone_replace

    subs = {u: _zeros_like_var(fi) for u, fi in zip(us, fs)}
    rops = clone_replace(rops, replace=subs)
    return rops[0] if single else rops


def subgraph_grad(wrt, end, start=None, cost=None, details=False):
    """Gradient of a subgraph segment (reference ``gradient.py:652``):
    both the start-seeded and the cost paths are CUT at ``end`` via
    consider_constant — a single uncut grad call would double-count any
    path flowing through ``end`` (review finding)."""
    if cost is None and start is None:
        raise ValueError("need cost and/or start")
    if not isinstance(end, list):
        raise TypeError("`end` must be a list")
    if not isinstance(wrt, list):
        raise TypeError("`wrt` must be a list")
    if start is not None and not isinstance(start, dict):
        raise TypeError("`start` must be a dictionary")

    params = list(dict.fromkeys(list(wrt) + list(end)))
    start_grads = None
    cost_grads = None
    if start is not None:
        start_grads = list(grad(
            cost=None, wrt=params, known_grads=start,
            consider_constant=end, disconnected_inputs="ignore",
        ))
    if cost is not None:
        cost_grads = list(grad(
            cost=cost, wrt=params,
            consider_constant=end, disconnected_inputs="ignore",
        ))
    if start is None:
        grads = cost_grads
    else:
        grads = start_grads
        if cost_grads is not None:
            grads = [g + cg for g, cg in zip(grads, cost_grads)]
    pgrads = dict(zip(params, grads))
    wrt_grads = [pgrads[k] for k in wrt]
    end_grads = [pgrads[k] for k in end]
    if details:
        return wrt_grads, end_grads, start_grads, cost_grads
    return wrt_grads, end_grads


# ---------------------------------------------------------------------------
# jacobian / hessian
# ---------------------------------------------------------------------------

def jacobian(expression, wrt, consider_constant=None, disconnected_inputs="raise"):
    """Jacobian rows via a symbolic scan (reference ``gradient.py:1906``)."""
    from aesara_tpu.scan.basic import scan
    from aesara_tpu.tensor.basic import arange
    from aesara_tpu.tensor.shape import shape

    if expression.type.ndim > 1:
        raise ValueError("jacobian expects a 0/1-d expression")
    single = not isinstance(wrt, (list, tuple))
    wrts = [wrt] if single else list(wrt)
    if expression.type.ndim == 0:
        res = grad(expression, wrts, consider_constant=consider_constant,
                   disconnected_inputs=disconnected_inputs)
        return res[0] if single else res

    def inner(i, expr, *args):
        return grad(expr[i], wrts, consider_constant=consider_constant,
                    disconnected_inputs=disconnected_inputs)

    rows, _ = scan(
        inner,
        sequences=[arange(shape(expression)[0])],
        non_sequences=[expression] + wrts,
    )
    if single:
        return rows if not isinstance(rows, (list, tuple)) else rows[0]
    return rows


def hessian(cost, wrt, consider_constant=None, disconnected_inputs="raise"):
    """Hessian via scan over gradient rows (reference ``gradient.py:1994``)."""
    from aesara_tpu.scan.basic import scan
    from aesara_tpu.tensor.basic import arange
    from aesara_tpu.tensor.shape import shape

    if cost.type.ndim != 0:
        raise TypeError("hessian cost must be scalar")
    single = not isinstance(wrt, (list, tuple))
    wrts = [wrt] if single else list(wrt)
    out = []
    for w in wrts:
        if w.type.ndim != 1:
            raise ValueError("hessian wrt must be vectors")
        g = grad(cost, w, consider_constant=consider_constant,
                 disconnected_inputs=disconnected_inputs)

        rows, _ = scan(
            lambda i, gy, x: grad(gy[i], x, disconnected_inputs="ignore"),
            sequences=[arange(shape(g)[0])],
            non_sequences=[g, w],
        )
        out.append(rows)
    return out[0] if single else out


# ---------------------------------------------------------------------------
# numeric checking
# ---------------------------------------------------------------------------

class numeric_grad:
    """Central-difference numeric gradient (reference ``gradient.py:1448``)."""

    def __init__(self, f, pt, eps=None):
        self.f = f
        # C-ordered owned copies: the perturbation loop writes through
        # reshape(-1) views, which silently COPY for non-contiguous
        # arrays (review finding: transposed inputs produced all-zero
        # numeric gradients).  np.array(order="C") keeps 0-d arrays 0-d
        # (ascontiguousarray would promote them to 1-d).
        self.pt = [np.array(p, order="C") for p in pt]
        dtypes = {p.dtype for p in self.pt if p.dtype.kind == "f"}
        smallest = min((np.finfo(dt).eps for dt in dtypes), default=np.finfo(np.float64).eps)
        if eps is None:
            eps = max(smallest * 1e4, 1e-7)
        self.eps = eps
        self.gf = [np.zeros_like(p, dtype=np.float64) for p in self.pt]
        for argi, p in enumerate(self.pt):
            if p.dtype.kind != "f":
                continue
            flat = p.reshape(-1)
            gflat = self.gf[argi].reshape(-1)
            for i in range(flat.size):
                orig = flat[i]
                flat[i] = orig + eps
                fp = np.asarray(f(*self.pt), dtype=np.float64)
                flat[i] = orig - eps
                fm = np.asarray(f(*self.pt), dtype=np.float64)
                flat[i] = orig
                gflat[i] = (fp - fm) / (2 * eps)

    @staticmethod
    def abs_rel_err(a, b):
        return abs(a - b), abs(a - b) / (abs(a) + abs(b) + 1e-8)

    def max_err(self, g_pt, abs_tol, rel_tol):
        """Worst tolerance violation between ``g_pt`` and the numeric grads.

        Reference contract (``gradient.py:1556``): for each argument,
        scale errors by the tolerances (``min(abs_err/abs_tol,
        rel_err/rel_tol)`` — a value > 1 means BOTH tolerances are
        exceeded), find the elementwise argmax, then return
        ``(max_arg, max_pos, abs_err, rel_err)`` for the globally worst
        element.
        """
        if len(g_pt) != len(self.gf):
            raise ValueError("argument count mismatch", len(g_pt), len(self.gf))
        pos, errs, abs_errs, rel_errs = [], [], [], []
        for a, b in zip(g_pt, self.gf):
            abs_err, rel_err = self.abs_rel_err(
                np.asarray(a, dtype=np.float64), b
            )
            if abs_err.size == 0:
                pos.append(0)
                errs.append(0.0)
                abs_errs.append(0.0)
                rel_errs.append(0.0)
                continue
            scaled = np.minimum(abs_err / abs_tol, rel_err / rel_tol)
            max_i = int(scaled.argmax())
            pos.append(max_i)
            errs.append(float(scaled.reshape(-1)[max_i]))
            abs_errs.append(float(np.asarray(abs_err).reshape(-1)[max_i]))
            rel_errs.append(float(np.asarray(rel_err).reshape(-1)[max_i]))
        max_arg = int(np.argmax(errs))
        return (max_arg, pos[max_arg], abs_errs[max_arg], rel_errs[max_arg])


def verify_grad(
    fun: Callable,
    pt: Sequence,
    n_tests: int = 2,
    rng=None,
    eps: Optional[float] = None,
    out_type=None,
    abs_tol: Optional[float] = None,
    rel_tol: Optional[float] = None,
    mode=None,
    cast_to_output_type: bool = False,
    no_debug_ref: bool = True,
):
    """Check ``fun``'s symbolic gradient against finite differences with a
    random projection (reference ``gradient.py:1678``)."""
    from aesara_tpu.compile.function import function
    from aesara_tpu.tensor.basic import as_tensor_variable
    from aesara_tpu.tensor.math import sum as tsum, mul as tmul, add as tadd
    from aesara_tpu.tensor.type import TensorType

    if rng is None:
        rng = np.random.default_rng(42)
    pt = [np.asarray(p) for p in pt]
    for p in pt:
        if p.dtype.kind == "f" and p.dtype.itemsize < 4:
            raise TypeError("verify_grad needs float32/float64 points")

    in_vars = [
        TensorType(str(p.dtype), p.shape)(f"input{i}") for i, p in enumerate(pt)
    ]
    out = fun(*in_vars)
    if isinstance(out, (list, tuple)):
        raise TypeError("verify_grad works on single-output functions")

    if abs_tol is None:
        abs_tol = 1e-5 if any(p.dtype == np.float32 for p in pt) else 1e-7
    if rel_tol is None:
        rel_tol = 1e-4 if any(p.dtype == np.float32 for p in pt) else 1e-6

    proj_dtype = out.type.dtype if out.type.dtype.startswith("float") else config.floatX
    t_r = TensorType(proj_dtype, out.type.shape)("random_projection")

    cost = tsum(tmul(t_r, out)) if out.type.ndim else tmul(t_r, out)
    cost_fn = function(in_vars + [t_r], cost, mode=mode, on_unused_input="ignore")
    sym_grads = grad(cost, in_vars, disconnected_inputs="ignore")
    grad_fn = function(in_vars + [t_r], sym_grads, mode=mode, on_unused_input="ignore")

    out_shape = _out_shape(out, pt, in_vars, mode)
    for _ in range(n_tests):
        r = rng.uniform(0.5, 1.0, size=out_shape).astype(proj_dtype)
        analytic = grad_fn(*pt, r)
        if not isinstance(analytic, (list, tuple)):
            analytic = [analytic]

        def f_for_numeric(*args):
            return cost_fn(*args, r)

        ng = numeric_grad(f_for_numeric, [p.copy() for p in pt], eps=eps)
        for argi, (a, num) in enumerate(zip(analytic, ng.gf)):
            a = np.asarray(a, dtype=np.float64)
            abs_err = np.abs(a - num)
            rel_err = abs_err / (np.abs(a) + np.abs(num) + 1e-8)
            bad = (abs_err > abs_tol) & (rel_err > rel_tol)
            if bad.any():
                idx = np.unravel_index(np.argmax(abs_err * bad), abs_err.shape)
                raise GradientError(
                    argi, idx, pt[argi].shape, a[idx], num[idx],
                    abs_err[idx], rel_err[idx], abs_tol, rel_tol,
                )
    return True


def _out_shape(out, pt, in_vars, mode):
    from aesara_tpu.compile.function import function

    fn = function(in_vars, out, on_unused_input="ignore", mode=mode)
    return np.asarray(fn(*pt)).shape


def _probe_shape(*args):  # pragma: no cover - legacy shim
    return None


# ---------------------------------------------------------------------------
# grad-manipulation ops (reference gradient.py tail)
# ---------------------------------------------------------------------------

class GradManipulatorOp(Op):
    """Identity forward; customized backward."""

    __props__ = ()
    view_map = {0: [0]}

    def make_node(self, x):
        from aesara_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def R_op(self, inputs, eval_points):
        return [eval_points[0]]


class ZeroGrad(GradManipulatorOp):
    def grad(self, inputs, output_grads):
        return [inputs[0].zeros_like(dtype=config.floatX)]


class DisconnectedGrad(GradManipulatorOp):
    def grad(self, inputs, output_grads):
        return [disconnected_type()]

    def connection_pattern(self, node):
        return [[False]]


class UndefinedGrad(GradManipulatorOp):
    def grad(self, inputs, output_grads):
        return [grad_undefined(self, 0, inputs[0], "undefined_grad applied")]


class GradClip(GradManipulatorOp):
    __props__ = ("clip_lower_bound", "clip_upper_bound")

    def __init__(self, clip_lower_bound, clip_upper_bound):
        self.clip_lower_bound = clip_lower_bound
        self.clip_upper_bound = clip_upper_bound

    def grad(self, inputs, output_grads):
        from aesara_tpu.tensor.math import clip as tclip

        (gz,) = output_grads
        return [tclip(gz, self.clip_lower_bound, self.clip_upper_bound)]


class GradScale(GradManipulatorOp):
    __props__ = ("multiplier",)

    def __init__(self, multiplier):
        self.multiplier = multiplier

    def grad(self, inputs, output_grads):
        from aesara_tpu.tensor.math import mul as tmul

        (gz,) = output_grads
        return [tmul(gz, self.multiplier)]


def zero_grad(x):
    return ZeroGrad()(x)


def disconnected_grad(x):
    return DisconnectedGrad()(x)


def undefined_grad(x):
    return UndefinedGrad()(x)


def grad_clip(x, lower_bound, upper_bound):
    return GradClip(lower_bound, upper_bound)(x)


def grad_scale(x, multiplier):
    return GradScale(multiplier)(x)


def consider_constant(x):
    """Deprecated alias of zero_grad (reference keeps it)."""
    return zero_grad(x)


class DisconnectedInputError(ValueError):
    """Raised when ``grad`` is asked for a wrt disconnected from the cost
    and ``disconnected_inputs='raise'`` (reference ``gradient.py``)."""


def as_list_or_tuple(use_list, use_tuple, outputs):
    """(reference ``gradient.py`` helper): wrap per the caller's flags."""
    if use_list and use_tuple:
        raise ValueError("use_list and use_tuple are mutually exclusive")
    if use_list:
        return list(outputs) if isinstance(outputs, (list, tuple)) else [outputs]
    if use_tuple:
        return tuple(outputs) if isinstance(outputs, (list, tuple)) else (outputs,)
    return outputs


#: reference keeps callable-class spellings of the grad-manipulation ops
consider_constant_ = consider_constant
zero_grad_ = zero_grad
disconnected_grad_ = disconnected_grad
undefined_grad_ = undefined_grad
ConsiderConstant = ZeroGrad  # reference alias: consider_constant IS zero_grad
