"""CVMLinker: the py-oracle schedule executed by the C++ VM
(reference ``link/vm.py:788`` VMLinker choosing the CVM).

Supports the lazy-thunk protocol: ops whose ``make_thunk`` returns a
thunk with ``thunk.lazy = True`` (IfElse) are scheduled demand-driven —
the thunk returns the THUNK INDICES it still needs (or None when done),
so only the taken branch of a conditional ever executes (reference
``lazylinker_c.c`` Stack semantics).  Update-storage pairs are applied
inside the VM.
"""

from __future__ import annotations

from typing import Optional

from aesara_tpu.graph.ir import Constant
from aesara_tpu.link.basic import Container, LocalLinker, map_storage, raise_with_op


class CVMLinker(LocalLinker):
    """Per-node thunks driven by the compiled C++ VM; falls back to the
    Python loop when no toolchain is available."""

    def __init__(self, allow_gc: Optional[bool] = None, time_thunks: bool = False,
                 update_map: Optional[dict] = None):
        super().__init__(allow_gc)
        self.time_thunks = time_thunks
        #: {output index: input index} — VM-applied update writeback
        self.update_map = update_map

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        from aesara_tpu.link.c.build import get_cvm_module

        fgraph = self.fgraph
        order = fgraph.toposort()
        input_storage, output_storage, storage_map = map_storage(
            fgraph, order, input_storage, output_storage, storage_map
        )
        compute_map = {v: [False] for v in storage_map}
        # leaves are always available
        for v in storage_map:
            if v.owner is None:
                compute_map[v][0] = True

        pos = {id(n): i for i, n in enumerate(order)}
        thunks = []
        for node in order:
            thunk = node.op.make_thunk(node, storage_map, compute_map, [])
            thunk.node = node
            if getattr(thunk, "lazy", False):
                # bake the input-position → thunk-index mapping in, so
                # the C side schedules on indices only
                thunk.input_owner_index = tuple(
                    pos.get(id(inp.owner), -1) if inp.owner is not None else -1
                    for inp in node.inputs
                )
            thunks.append(thunk)
        lazy_flags = tuple(
            int(bool(getattr(t, "lazy", False))) for t in thunks
        )

        # gc: last-use clear lists per thunk
        clear_lists = []
        if self.allow_gc:
            last_user = {}
            for i, node in enumerate(order):
                for inp in node.inputs:
                    last_user[inp] = i
            protected = set(fgraph.inputs) | set(fgraph.outputs)
            for i, node in enumerate(order):
                clear_lists.append(tuple(
                    storage_map[inp]
                    for inp in node.inputs
                    if inp not in protected
                    and not isinstance(inp, Constant)
                    and last_user.get(inp) == i
                ))
        else:
            clear_lists = [() for _ in order]

        # dependency indices for lazy subset evaluation
        node_deps = [
            tuple(
                pos[id(inp.owner)]
                for inp in node.inputs
                if inp.owner is not None and id(inp.owner) in pos
            )
            for node in order
        ]
        default_targets = tuple(sorted({
            pos[id(o.owner)] for o in fgraph.outputs
            if o.owner is not None and id(o.owner) in pos
        }))
        update_pairs = tuple(
            (input_storage[in_idx], output_storage[out_idx])
            for out_idx, in_idx in (self.update_map or {}).items()
        )

        input_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.inputs, input_storage)
        ]
        output_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.outputs, output_storage)
        ]

        # lazy thunks consult compute_map: computed-flags of DERIVED vars
        # must reset at the start of every call (leaves stay available)
        any_lazy = any(lazy_flags)
        reset_cells = (
            [compute_map[v] for v in storage_map if v.owner is not None]
            if any_lazy else []
        )

        mod = get_cvm_module()
        if mod is not None:
            vm = mod.CVM(
                tuple(thunks), tuple(clear_lists), tuple(node_deps),
                int(bool(self.allow_gc)), int(bool(self.time_thunks)),
                lazy_flags, update_pairs, default_targets,
            )

            def run():
                for c in reset_cells:
                    c[0] = False
                try:
                    vm()
                except Exception as e:
                    idx = getattr(e, "position_of_error", None)
                    if idx is not None and 0 <= idx < len(order):
                        raise_with_op(fgraph, order[int(idx)])
                    raise

            run.vm = vm
            run.order = order
        else:  # python fallback (same semantics, incl. lazy scheduling)

            def _run_targets(targets, done):
                stack = list(targets)
                visiting = set()
                while stack:
                    i = stack[-1]
                    if done[i]:
                        stack.pop()
                        continue
                    if lazy_flags[i]:
                        res = thunks[i]()
                        if res is None:
                            done[i] = True
                            stack.pop()
                            continue
                        stack.extend(d for d in res if d >= 0 and not done[d])
                        continue
                    if i not in visiting:
                        visiting.add(i)
                        pending = [d for d in node_deps[i] if not done[d]]
                        if pending:
                            stack.extend(pending)
                            continue
                    try:
                        thunks[i]()
                    except Exception:
                        raise_with_op(fgraph, thunks[i].node, thunks[i])
                    for cell in clear_lists[i]:
                        cell[0] = None
                    done[i] = True
                    stack.pop()

            def run():
                if any_lazy:
                    for c in reset_cells:
                        c[0] = False
                    done = [False] * len(thunks)
                    _run_targets(default_targets, done)
                else:
                    for thunk, clears in zip(thunks, clear_lists):
                        try:
                            thunk()
                        except Exception:
                            raise_with_op(fgraph, thunk.node, thunk)
                        for cell in clears:
                            cell[0] = None
                for dst, src in update_pairs:
                    dst[0] = src[0]

            run.order = order
        run.thunks = thunks
        run.storage_map = storage_map
        return run, input_containers, output_containers, thunks, order
