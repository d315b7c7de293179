"""GoldilocksProver — the device-resident prove() pipeline for f64 configs.

Same 8-step protocol as the host :class:`winterfell_tpu.prover.Prover`
(prover/src/lib.rs:282-492), but every hot step runs on the accelerator via
``winterfell_tpu.ops.goldilocks``:

- trace/aux/composition interpolation + coset LDE: device NTT
- row hashing + Merkle layer reduction: vectorized Rescue-Prime
- constraint evaluation: the AIR's own ``evaluate_transition`` traced with
  :class:`JaxOps` over the whole CE domain in one jit
- DEEP composition: pointwise rational evaluation over the LDE domain —
  C_z(x)/(x−z) + C_gz(x)/(x−z·g) with batched extension inversion. This is
  mathematically identical to the reference's coefficient-space synthetic
  division (prover/src/composer/mod.rs:186-199) because the numerators vanish
  at z and z·g, so the produced evaluations — and therefore the proof bytes —
  are bit-identical.
- FRI folding: device ``fri_fold``

Only digests, OOD scalars, and queried rows cross to the host; the
Fiat–Shamir transcript stays in the host channel, mirroring the reference's
channel/compute split.

Proof bytes are asserted identical to the host prover in
tests/test_device_prover.py — the two pipelines are pinned together.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax

from ..air.air import EvaluationFrame
from ..air.divisor import ConstraintDivisor
from ..air.proof import FriProof, FriProofLayer, Proof, Queries
from ..crypto.hashers import Rp64_256
from ..crypto.merkle import MerkleTree
from ..fri import FriOptions, fold_positions
from ..math import ntt as host_ntt
from ..math.fields import F64, Field
from ..ops import goldilocks as gl
from ..ops.jax_ops import JaxOps
from . import Prover
from .channel import ProverChannel

jnp = gl.jnp


class _DigestView:
    """List-of-bytes view over an (n, 4) uint64 digest array (LE u64 rows are
    exactly the ElementDigest byte layout). Works over a device array: each
    index pulls one 32-byte row, so proof generation transfers only the few
    hundred nodes a batch opening touches."""

    __slots__ = ("arr", "_n")

    def __init__(self, arr):
        self.arr = arr
        self._n = arr.shape[0]

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i) -> bytes:
        return np.asarray(self.arr[i]).astype("<u8").tobytes()


class _HeapNodesView:
    """Heap-indexed digest view over per-level device arrays: index i in
    [size, 2·size) reads levels[size][i − size]."""

    __slots__ = ("levels", "_n")

    def __init__(self, levels: dict, num_leaves: int):
        self.levels = levels
        self._n = num_leaves

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i) -> bytes:
        size = 1 << (int(i).bit_length() - 1)
        row = self.levels[size][int(i) - size]
        return np.asarray(row).astype("<u8").tobytes()


class PrehashedMerkleTree(MerkleTree):
    """MerkleTree over digests hashed on-device; reuses the host proof logic."""

    def __init__(self, leaves_view: _DigestView, nodes_view: _DigestView, hasher):
        self.leaves = leaves_view
        self.hasher = hasher
        self.nodes = nodes_view


def _gl_sum(arr, axis: int = 0):
    """Tree-structured modular sum along a power-of-two axis."""
    arr = jnp.moveaxis(arr, axis, 0)
    while arr.shape[0] > 1:
        half = arr.shape[0] // 2
        arr = gl.gl_add(arr[:half], arr[half : 2 * half])
    return arr[0]


def _z_power_table(ext: Field, z: tuple, n: int):
    """(n, d) device table of z^k, built by log-doubling."""
    d = ext.degree
    table = np.zeros((1, d), dtype=np.uint64)
    table[0] = list(ext.one())
    cur = jnp.asarray(table)
    length = 1
    while length < n:
        zl = ext.exp(z, length)
        zl_arr = jnp.asarray(np.array([list(zl)], dtype=np.uint64))
        cur = jnp.concatenate(
            [cur, gl.ext_mul(cur, jnp.broadcast_to(zl_arr, cur.shape))], axis=0)
        length *= 2
    return cur


def _ext_scalar(e: tuple):
    return jnp.asarray(np.array([list(e)], dtype=np.uint64))


def _power_series_dev(s: int, n: int, scale: int = 1):
    """Device power series via log-doubling (avoids O(n) host bigint loops)."""
    cur = jnp.asarray(np.array([scale % gl.P], dtype=np.uint64))
    length = 1
    s_pow = s % gl.P
    while length < n:
        cur = jnp.concatenate([cur, gl.gl_mul(cur, jnp.uint64(s_pow))], axis=0)
        s_pow = s_pow * s_pow % gl.P
        length *= 2
    return cur


class GoldilocksProver(Prover):
    """Drop-in Prover for f64 AIRs with the Rp64_256 hasher. Subclass or wrap
    an existing prover class via ``accelerate``."""

    @classmethod
    def accelerate(cls, prover_cls):
        """Builds a device-accelerated subclass of a host Prover class."""
        return type(f"Goldilocks{prover_cls.__name__}", (cls, prover_cls), {})

    def prove(self, trace) -> Proof:
        pub_inputs = self.get_pub_inputs(trace)
        air = self.air_class(trace.info(), pub_inputs, self.options)
        assert air.base is F64, "GoldilocksProver requires the f64 base field"
        assert self.hasher is Rp64_256, (
            "GoldilocksProver requires the Rp64_256 hasher (device row hashing)"
        )
        channel = ProverChannel(air, air.pub_inputs_to_elements(), self.hasher)

        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        blowup = air.options.blowup_factor
        offset = air.domain_offset
        lde_size = air.lde_domain_size
        ce_blowup = air.ce_blowup_factor
        ce = air.context.ce_domain_size

        # 1 ----- trace commitment ------------------------------------------
        main_dev = gl.to_device(trace.main_segment())  # (n, w)
        main_polys = gl.ntt_interpolate(main_dev, n)
        main_lde = gl.ntt_evaluate_with_offset(main_polys, n, offset, blowup)
        main_tree = self._commit_rows(main_lde)
        channel.commit_trace(main_tree.root)

        aux_polys = None
        aux_lde = None
        aux_tree = None
        aux_rand_elements = None
        if air.trace_info.is_multi_segment:
            aux_rand_elements = air.get_aux_rand_elements(channel.public_coin)
            aux_obj = self.build_aux_trace(trace, aux_rand_elements)
            aux_dev = gl.to_device(aux_obj)  # (n, w_aux, d)
            aux_polys = gl.ntt_interpolate(aux_dev, n)
            aux_lde = gl.ntt_evaluate_with_offset(aux_polys, n, offset, blowup)
            aux_tree = self._commit_rows(aux_lde.reshape(lde_size, -1))
            channel.commit_trace(aux_tree.root)

        # 2 ----- constraint evaluation -------------------------------------
        ccs = channel.get_constraint_composition_coeffs()
        ce_column = self._evaluate_constraints(
            air, main_lde, aux_lde, aux_rand_elements, ccs)  # (ce, d)

        # 3 ----- composition commitment ------------------------------------
        num_cols = air.context.num_constraint_composition_columns()
        comp_coeffs = gl.ntt_interpolate_with_offset(ce_column, ce, offset)
        comp_columns = jnp.swapaxes(
            comp_coeffs[: num_cols * n].reshape(num_cols, n, d), 0, 1)  # (n,cols,d)
        comp_lde = gl.ntt_evaluate_with_offset(comp_columns, n, offset, blowup)
        comp_tree = self._commit_rows(comp_lde.reshape(lde_size, -1))
        channel.commit_constraints(comp_tree.root)

        # 4 ----- OOD evaluations + DEEP ------------------------------------
        z = channel.get_ood_point()
        g_trace = F64.get_root_of_unity(n.bit_length() - 1)
        zg = ext.mul_base(z, g_trace)
        z_pows = _z_power_table(ext, z, n)     # (n, d)
        zg_pows = _z_power_table(ext, zg, n)

        def eval_cols_at(polys, pows):
            # polys (n, k) base or (n, k, d) ext; returns list of ext tuples
            out = []
            if polys.ndim == 2:
                for c in range(polys.shape[1]):
                    acc = _gl_sum(gl.ext_mul_base(pows, polys[:, c]))
                    out.append(tuple(int(x) for x in np.asarray(acc)))
            else:
                for c in range(polys.shape[1]):
                    acc = _gl_sum(gl.ext_mul(pows, polys[:, c]))
                    out.append(tuple(int(x) for x in np.asarray(acc)))
            return out

        trace_cur = eval_cols_at(main_polys, z_pows)
        trace_nxt = eval_cols_at(main_polys, zg_pows)
        if aux_polys is not None:
            trace_cur += eval_cols_at(aux_polys, z_pows)
            trace_nxt += eval_cols_at(aux_polys, zg_pows)
        quot_cur = eval_cols_at(comp_columns, z_pows)
        quot_nxt = eval_cols_at(comp_columns, zg_pows)

        channel.send_ood_evaluations(trace_cur, trace_nxt, quot_cur, quot_nxt)
        deep_ccs = channel.get_deep_composition_coeffs()

        deep_evaluations = self._deep_evaluations(
            air, ext, main_lde, aux_lde, comp_lde, z, zg,
            trace_cur, trace_nxt, quot_cur, quot_nxt, deep_ccs)  # (lde, d)

        # 6 ----- FRI layers -------------------------------------------------
        fri_options = FriOptions(
            blowup, air.options.fri_folding_factor,
            air.options.fri_remainder_max_degree)
        n_fold = fri_options.folding_factor
        fri_layers = []  # (tree, transposed_np (rows, N, d))
        evaluations = deep_evaluations
        for _ in range(fri_options.num_fri_layers(lde_size)):
            cur_n = evaluations.shape[0]
            rows = cur_n // n_fold
            transposed = jnp.swapaxes(
                evaluations.reshape(n_fold, rows, d), 0, 1)  # (rows, N, d)
            tree = self._commit_rows(transposed.reshape(rows, n_fold * d))
            channel.commit_fri_layer(tree.root)
            alpha = channel.draw_fri_alpha()
            evaluations = gl.fri_fold(
                evaluations, n_fold, offset, jnp.asarray(
                    np.array(list(alpha), dtype=np.uint64)))
            fri_layers.append((tree, transposed))

        rem_n = evaluations.shape[0]
        rem_coeffs = gl.ntt_interpolate_with_offset(evaluations, rem_n, offset)
        keep = rem_n // blowup
        rem_np = np.asarray(rem_coeffs[:keep])[::-1]
        remainder_poly = [tuple(int(x) for x in row) for row in rem_np]
        channel.commit_fri_layer(self.hasher.hash_elements(remainder_poly, ext))

        # 7 ----- query positions -------------------------------------------
        channel.grind_query_seed()
        query_positions = channel.get_query_positions()

        # 8 ----- proof assembly --------------------------------------------
        proof_layers = []
        positions = list(query_positions)
        domain_size = lde_size
        for tree, transposed in fri_layers:
            positions = fold_positions(positions, domain_size, n_fold)
            _, batch_proof = tree.prove_batch(positions)
            query_values = [
                [tuple(int(x) for x in row[j]) for j in range(n_fold)]
                for row in (np.asarray(transposed[p]) for p in positions)
            ]
            proof_layers.append(
                FriProofLayer.new(ext, query_values, batch_proof.to_bytes()))
            domain_size //= n_fold
        fri_proof = FriProof.new(ext, proof_layers, remainder_poly, 1)

        base_field = Field(F64, 1)
        trace_queries = [self._query(main_tree, main_lde, query_positions,
                                     base_field, 1)]
        if aux_tree is not None:
            trace_queries.append(self._query(aux_tree, aux_lde, query_positions,
                                             ext, d))
        constraint_queries = self._query(comp_tree, comp_lde, query_positions,
                                         ext, d)

        return channel.build_proof(
            trace_queries, constraint_queries, fri_proof, len(query_positions))

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _commit_rows(self, rows_2d) -> PrehashedMerkleTree:
        leaves = gl.rp64_hash_rows(rows_2d)
        levels = gl.merkle_levels_rp64(leaves)
        return PrehashedMerkleTree(
            _DigestView(leaves),
            _HeapNodesView(levels, leaves.shape[0]),
            self.hasher)

    @staticmethod
    def _query(tree, lde, positions: List[int], field: Field,
               d: int) -> Queries:
        _, proof = tree.prove_batch(positions)
        rows = []
        for p in positions:
            row = np.asarray(lde[p])  # single-row device pull
            if row.ndim == 1:  # base field row (w,)
                rows.append([(int(v),) for v in row])
            else:  # (w, d)
                rows.append([tuple(int(x) for x in e) for e in row])
        return Queries.new(proof.to_bytes(), rows, field)

    # ------------------------------------------------------------------

    def _evaluate_constraints(self, air, main_lde, aux_lde, aux_rand_elements,
                              ccs):
        """Device mirror of prover/evaluator.py: one jit over the CE domain."""
        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        blowup = air.options.blowup_factor
        ce_blowup = air.ce_blowup_factor
        ce = air.context.ce_domain_size
        offset = air.domain_offset
        stride = blowup // ce_blowup
        p = gl.P

        # CE-domain trace values: stride-slice of the LDE
        main_ce = main_lde[::stride]
        main_ce_next = jnp.roll(main_ce, -ce_blowup, axis=0)
        aux_ce = aux_ce_next = None
        if aux_lde is not None:
            aux_ce = aux_lde[::stride]
            aux_ce_next = jnp.roll(aux_ce, -ce_blowup, axis=0)

        # periodic values over the CE domain (device, tiled)
        periodic_dev = []
        for poly in air.get_periodic_column_polys():
            c = len(poly)
            coeffs = np.array(poly, dtype=np.uint64)[:, None]
            vals = host_ntt.evaluate_poly_with_offset(
                F64, coeffs.astype(object), pow(offset, n // c, p), ce_blowup)
            arr = jnp.asarray(vals.astype(np.uint64))  # (c·ce_blowup, 1)
            periodic_dev.append(jnp.tile(arr, (ce // arr.shape[0], 1)))

        t_ccs = ccs.transition
        n_main = len(air.context.main_degrees)

        # boundary structure (host-side; values/ccs go in as arrays)
        boundary = air.get_boundary_constraints(aux_rand_elements, ccs.boundary)

        # divisor inverses (shared across groups, device arrays)
        xs = _power_series_dev(F64.get_root_of_unity(ce.bit_length() - 1), ce,
                               offset)
        divisor = ConstraintDivisor.from_transition(
            F64, n, air.context.num_transition_exemptions)

        def transition_divisor_inv():
            num = gl.gl_sub(gl.gl_pow_const(xs, n), jnp.uint64(1))
            inv_num = gl.gl_inv(num)
            exempt = jnp.ones(ce, dtype=jnp.uint64)
            for e in divisor.exemptions:
                exempt = gl.gl_mul(exempt, gl.gl_sub(xs, jnp.uint64(e)))
            return gl.gl_mul(inv_num, exempt)

        def boundary_divisor_inv(a: int, b0: int):
            vals = gl.gl_sub(gl.gl_pow_const(xs, a), jnp.uint64(b0))
            return gl.gl_inv(vals)

        def run(main_ce, main_ce_next, aux_ce, aux_ce_next):
            base_ops = JaxOps(Field(F64, 1))
            frame = EvaluationFrame(
                [main_ce[:, c : c + 1] for c in range(main_ce.shape[1])],
                [main_ce_next[:, c : c + 1] for c in range(main_ce.shape[1])])
            main_evals = air.evaluate_transition(frame, periodic_dev, base_ops)

            combined = jnp.zeros((ce, d), dtype=jnp.uint64)
            for ev, cc in zip(main_evals, t_ccs[:n_main]):
                combined = gl.ext_add(combined, gl.gl_mul(ev, _ext_scalar(cc)))

            if aux_ce is not None:
                ext_ops = JaxOps(ext)
                lift = lambda a: jnp.pad(a, ((0, 0), (0, d - 1)))
                main_frame_ext = EvaluationFrame(
                    [lift(main_ce[:, c : c + 1]) for c in range(main_ce.shape[1])],
                    [lift(main_ce_next[:, c : c + 1])
                     for c in range(main_ce.shape[1])])
                periodic_ext = [lift(pv) for pv in periodic_dev]
                aux_frame = EvaluationFrame(
                    [aux_ce[:, c] for c in range(aux_ce.shape[1])],
                    [aux_ce_next[:, c] for c in range(aux_ce.shape[1])])
                aux_evals = air.evaluate_aux_transition(
                    main_frame_ext, aux_frame, periodic_ext,
                    aux_rand_elements, ext_ops)
                for ev, cc in zip(aux_evals, t_ccs[n_main:]):
                    combined = gl.ext_add(
                        combined,
                        gl.ext_mul(ev, jnp.broadcast_to(_ext_scalar(cc), ev.shape)))

            result = gl.ext_mul_base(combined, transition_divisor_inv())

            # boundary groups
            for group, values_source in (
                [(g, "main") for g in boundary.main_groups]
                + [(g, "aux") for g in boundary.aux_groups]
            ):
                numer = jnp.zeros((ce, d), dtype=jnp.uint64)
                for c in group.constraints:
                    cc_arr = _ext_scalar(c.cc)
                    if values_source == "main":
                        trace_vals = main_ce[:, c.column]  # (ce,)
                        b_vals = self._boundary_values_dev(c, ce, offset, n, 1)
                        diff = gl.gl_sub(trace_vals, b_vals)  # (ce,)
                        numer = gl.ext_add(numer, gl.gl_mul(diff[:, None], cc_arr))
                    else:
                        trace_vals = aux_ce[:, c.column]  # (ce, d)
                        b_vals = self._boundary_values_dev(c, ce, offset, n, d)
                        diff = gl.ext_sub(trace_vals, b_vals)
                        numer = gl.ext_add(
                            numer,
                            gl.ext_mul(diff, jnp.broadcast_to(cc_arr, diff.shape)))
                (a, b0), = group.divisor.numerator
                result = gl.ext_add(
                    result,
                    gl.ext_mul_base(numer, boundary_divisor_inv(a, b0)))
            return result

        if aux_ce is None:
            return jax.jit(lambda m, mn: run(m, mn, None, None))(
                main_ce, main_ce_next)
        return jax.jit(run)(main_ce, main_ce_next, aux_ce, aux_ce_next)

    @staticmethod
    def _boundary_values_dev(c, ce: int, offset: int, n: int, d: int):
        """b_j(x·poly_offset) over the CE coset as a device array."""
        p = gl.P
        if len(c.poly) == 1:
            if d == 1:
                return jnp.full((ce,), np.uint64(c.poly[0][0] % p),
                                dtype=jnp.uint64)
            return jnp.broadcast_to(
                jnp.asarray(np.array(list(c.poly[0]), dtype=np.uint64)), (ce, d))
        # general: pad coefficients to ce and evaluate over the shifted coset
        k = len(c.poly)
        coeffs = np.zeros((ce, d), dtype=np.uint64)
        for i, v in enumerate(c.poly):
            row = list(v) if d > 1 else [v[0]]
            coeffs[i, : len(row)] = row
        eff_offset = offset * c.poly_offset % p
        out = gl.ntt_evaluate_with_offset(
            jnp.asarray(coeffs), ce, eff_offset, 1)
        return out if d > 1 else out[:, 0]

    # ------------------------------------------------------------------

    @staticmethod
    def _deep_evaluations(air, ext, main_lde, aux_lde, comp_lde, z, zg,
                          trace_cur, trace_nxt, quot_cur, quot_nxt, deep_ccs):
        """DEEP over the LDE domain: (C_z(x))/(x−z) + (C_gz(x))/(x−z·g)."""
        d = ext.degree
        lde_size = main_lde.shape[0]
        offset = air.domain_offset
        h = F64.get_root_of_unity(lde_size.bit_length() - 1)
        xs = _power_series_dev(h, lde_size, offset)  # (lde,)

        def accumulate():
            comp_z = jnp.zeros((lde_size, d), dtype=jnp.uint64)
            comp_gz = jnp.zeros((lde_size, d), dtype=jnp.uint64)
            idx = 0
            for c in range(main_lde.shape[1]):
                cc = _ext_scalar(deep_ccs.trace[idx])
                term = gl.gl_mul(main_lde[:, c : c + 1], cc)  # (lde, d)
                adj_z = _ext_scalar(ext.mul(trace_cur[idx], deep_ccs.trace[idx]))
                adj_gz = _ext_scalar(ext.mul(trace_nxt[idx], deep_ccs.trace[idx]))
                comp_z = gl.ext_add(comp_z, gl.ext_sub(
                    term, jnp.broadcast_to(adj_z, term.shape)))
                comp_gz = gl.ext_add(comp_gz, gl.ext_sub(
                    term, jnp.broadcast_to(adj_gz, term.shape)))
                idx += 1
            if aux_lde is not None:
                for c in range(aux_lde.shape[1]):
                    cc = _ext_scalar(deep_ccs.trace[idx])
                    term = gl.ext_mul(
                        aux_lde[:, c], jnp.broadcast_to(cc, aux_lde[:, c].shape))
                    adj_z = _ext_scalar(ext.mul(trace_cur[idx], deep_ccs.trace[idx]))
                    adj_gz = _ext_scalar(ext.mul(trace_nxt[idx], deep_ccs.trace[idx]))
                    comp_z = gl.ext_add(comp_z, gl.ext_sub(
                        term, jnp.broadcast_to(adj_z, term.shape)))
                    comp_gz = gl.ext_add(comp_gz, gl.ext_sub(
                        term, jnp.broadcast_to(adj_gz, term.shape)))
                    idx += 1
            for j in range(comp_lde.shape[1]):
                cc = _ext_scalar(deep_ccs.constraints[j])
                term = gl.ext_mul(
                    comp_lde[:, j], jnp.broadcast_to(cc, comp_lde[:, j].shape))
                adj_z = _ext_scalar(ext.mul(quot_cur[j], deep_ccs.constraints[j]))
                adj_gz = _ext_scalar(ext.mul(quot_nxt[j], deep_ccs.constraints[j]))
                comp_z = gl.ext_add(comp_z, gl.ext_sub(
                    term, jnp.broadcast_to(adj_z, term.shape)))
                comp_gz = gl.ext_add(comp_gz, gl.ext_sub(
                    term, jnp.broadcast_to(adj_gz, term.shape)))

            xs_ext = jnp.pad(xs[:, None], ((0, 0), (0, d - 1)))  # x as ext
            den_z = gl.ext_sub(xs_ext, jnp.broadcast_to(_ext_scalar(z),
                                                        xs_ext.shape))
            den_gz = gl.ext_sub(xs_ext, jnp.broadcast_to(_ext_scalar(zg),
                                                         xs_ext.shape))
            return gl.ext_add(
                gl.ext_mul(comp_z, gl.ext_inv(den_z)),
                gl.ext_mul(comp_gz, gl.ext_inv(den_gz)))

        return jax.jit(accumulate)()
