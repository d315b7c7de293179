"""The STARK prover — the 8-step pipeline of prover/src/lib.rs:282-492.

The heavy steps (NTT LDE, row hashing, constraint evaluation, DEEP, FRI) run
through the exact vectorized math layer; on Goldilocks configs they are
dispatched to the JAX/TPU engine in ``winterfell_tpu.ops`` when available.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..air.proof import Proof, Queries
from ..crypto.merkle import MerkleTree
from ..fri import FriOptions, FriProver
from ..math import ntt, polynom, vecmath as vm
from ..math.fields import Field
from ..utils import tracing
from .channel import ProverChannel
from .evaluator import DefaultConstraintEvaluator
from .trace import Trace, TraceTable

__all__ = ["Prover", "ProverError", "Trace", "TraceTable", "ProverChannel",
           "DefaultConstraintEvaluator"]


class ProverError(Exception):
    pass


def _hash_rows(hasher, field: Field, rows: np.ndarray,
               partition_options=None) -> list:
    """Row-wise hash_elements: (n, w) base array or (n, w, d) ext array.
    With multiple partitions, each row is hashed in column chunks and the
    chunk digests combined with merge_many — the reference's multi-device
    commitment mode (prover/src/matrix/row_matrix.rs:184-229)."""
    def row_elems(row):
        if row.ndim == 1:
            return [(int(v),) for v in row]
        return [tuple(int(x) for x in e) for e in row]

    num_cols = rows.shape[1]
    psize = num_cols
    if partition_options is not None:
        psize = partition_options.partition_size(num_cols, field.degree)
    if psize >= num_cols:
        from ..crypto import native
        from ..crypto.hashers import Blake3_192, Blake3_256

        if native.available() and hasher in (Blake3_256, Blake3_192):
            # byte hashers hash the canonical row bytes: serialize all rows
            # and batch through the native C BLAKE3
            eb = field.base.element_bytes
            flat = rows.reshape(rows.shape[0], -1)
            row_len = flat.shape[1] * eb
            buf = bytearray(rows.shape[0] * row_len)
            pos = 0
            for row in flat:
                for v in row:
                    buf[pos : pos + eb] = int(v).to_bytes(eb, "little")
                    pos += eb
            digests = native.blake3_many(bytes(buf), rows.shape[0], row_len)
            if hasher.digest_size != 32:
                digests = [d[: hasher.digest_size] for d in digests]
            return digests
        return [hasher.hash_elements(row_elems(row), field) for row in rows]
    out = []
    for row in rows:
        elems = row_elems(row)
        chunks = [elems[i : i + psize] for i in range(0, num_cols, psize)]
        digests = [hasher.hash_elements(c, field) for c in chunks]
        out.append(hasher.merge_many(digests))
    return out


class _CommittedMatrix:
    """LDE evaluations + vector commitment (TraceLde / ConstraintCommitment
    internals: prover/src/trace/trace_lde/default/mod.rs:245-305)."""

    def __init__(self, lde: np.ndarray, field: Field, hasher,
                 partition_options=None):
        self.lde = lde
        self.field = field
        leaves = _hash_rows(hasher, field, lde, partition_options)
        self.tree = MerkleTree(leaves, hasher)

    @property
    def root(self) -> bytes:
        return self.tree.root

    def query(self, positions: List[int]) -> Queries:
        """Rows at the queried positions + batch opening proof
        (trace_lde/default/mod.rs:199-215)."""
        _, proof = self.tree.prove_batch(positions)
        if self.lde.ndim == 2:
            rows = [[(int(v),) for v in self.lde[p]] for p in positions]
            qfield = Field(self.field.base, 1)
        else:
            rows = [vm.totuples(self.lde[p]) for p in positions]
            qfield = self.field
        return Queries.new(proof.to_bytes(), rows, qfield)


class Prover:
    """Subclasses define: ``options``, ``hasher``, ``get_pub_inputs(trace)``
    and the AIR class (``air_class``); Randomized AIRs also override
    ``build_aux_trace``. Set ``debug_validate=True`` to re-execute the trace
    against the AIR before proving (the reference's debug_assertions check,
    prover/src/lib.rs:352-356)."""

    air_class = None
    hasher = None
    debug_validate = False

    def __init__(self, options):
        self.options = options

    # -- required interface --------------------------------------------------

    def get_pub_inputs(self, trace: Trace):
        raise NotImplementedError

    def build_aux_trace(self, trace: Trace, aux_rand_elements) -> np.ndarray:
        """Returns (n, aux_width, d) object array of extension elements."""
        raise NotImplementedError("build_aux_trace() not implemented")

    # -- the pipeline --------------------------------------------------------

    def prove(self, trace: Trace) -> Proof:
        # 0 ----- instantiate AIR and prover channel -------------------------
        pub_inputs = self.get_pub_inputs(trace)
        air = self.air_class(trace.info(), pub_inputs, self.options)
        channel = ProverChannel(air, air.pub_inputs_to_elements(), self.hasher)
        phases = tracing.Phases("prove")

        base = air.base
        p = base.p
        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        blowup = air.options.blowup_factor
        offset = air.domain_offset
        lde_domain_size = air.lde_domain_size
        base_field = Field(base, 1)

        # 1 ----- commit to the execution trace ------------------------------
        main = trace.main_segment()
        main_polys = ntt.interpolate_poly(base, main)  # (n, w)
        main_lde = ntt.evaluate_poly_with_offset(base, main_polys, offset, blowup)
        part_opts = air.options.partition_options
        main_committed = _CommittedMatrix(main_lde, base_field, self.hasher,
                                          part_opts)
        channel.commit_trace(main_committed.root)

        aux_committed = None
        aux_polys = None
        aux_rand_elements = None
        if air.trace_info.is_multi_segment:
            aux_rand_elements = air.get_aux_rand_elements(channel.public_coin)
            aux_trace = self.build_aux_trace(trace, aux_rand_elements)
            aux_polys = ntt.interpolate_poly(base, aux_trace)  # (n, w_aux, d)
            aux_lde = ntt.evaluate_poly_with_offset(base, aux_polys, offset, blowup)
            aux_committed = _CommittedMatrix(aux_lde, ext, self.hasher,
                                             part_opts)
            channel.commit_trace(aux_committed.root)

        phases.mark("commit_to_trace_segments", lde_domain_size=lde_domain_size)

        if self.debug_validate:
            trace.validate(air)

        # 2 ----- evaluate constraints ---------------------------------------
        constraint_coeffs = channel.get_constraint_composition_coeffs()
        evaluator = DefaultConstraintEvaluator(air, aux_rand_elements, constraint_coeffs)
        ce_column = evaluator.evaluate(main_polys, aux_polys)  # (ce, d)

        phases.mark("evaluate_constraints")

        # 3 ----- commit to constraint evaluations ---------------------------
        # iFFT the CE column, split into num_cols columns of trace length
        # (composition_poly.rs:55-85), then LDE + commit.
        num_cols = air.context.num_constraint_composition_columns()
        comp_coeffs_full = ntt.interpolate_poly_with_offset(base, ce_column, offset)
        comp_columns = np.stack(
            [comp_coeffs_full[j * n : (j + 1) * n] for j in range(num_cols)],
            axis=1)  # (n, num_cols, d)
        comp_lde = ntt.evaluate_poly_with_offset(base, comp_columns, offset, blowup)
        constraint_committed = _CommittedMatrix(comp_lde, ext, self.hasher,
                                                part_opts)
        channel.commit_constraints(constraint_committed.root)

        phases.mark("commit_to_constraint_evaluations")

        # 4 ----- build DEEP composition polynomial --------------------------
        z = channel.get_ood_point()
        g_trace = base.get_root_of_unity(n.bit_length() - 1)
        zg = ext.mul_base(z, g_trace)

        # OOD frames: trace polys and composition columns at z and z·g
        trace_cur, trace_nxt = [], []
        for c in range(main_polys.shape[1]):
            coeffs = [(int(v),) for v in main_polys[:, c]]
            lifted = [ext.from_base(v[0]) for v in coeffs]
            trace_cur.append(polynom.eval_poly(ext, lifted, z))
            trace_nxt.append(polynom.eval_poly(ext, lifted, zg))
        if aux_polys is not None:
            for c in range(aux_polys.shape[1]):
                coeffs = vm.totuples(aux_polys[:, c])
                trace_cur.append(polynom.eval_poly(ext, coeffs, z))
                trace_nxt.append(polynom.eval_poly(ext, coeffs, zg))
        quot_cur, quot_nxt = [], []
        for j in range(num_cols):
            coeffs = vm.totuples(comp_columns[:, j])
            quot_cur.append(polynom.eval_poly(ext, coeffs, z))
            quot_nxt.append(polynom.eval_poly(ext, coeffs, zg))

        channel.send_ood_evaluations(trace_cur, trace_nxt, quot_cur, quot_nxt)
        deep_ccs = channel.get_deep_composition_coeffs()

        # accumulate Σ cc_i·(T_i(x) − T_i(z)) and Σ cc_i·(T_i(x) − T_i(z·g))
        # (composer/mod.rs:67-166)
        composition_z = vm.zeros((n, d))
        composition_gz = vm.zeros((n, d))
        idx = 0
        for c in range(main_polys.shape[1]):
            poly_base = main_polys[:, c]  # (n,) base
            cc = deep_ccs.trace[idx]
            ccv = np.array(list(cc), dtype=object)
            term = poly_base[:, None] * ccv[None, :] % p  # mul_acc
            composition_z = (composition_z + term) % p
            composition_gz = (composition_gz + term) % p
            adj_z = ext.mul(trace_cur[idx], cc)
            adj_gz = ext.mul(trace_nxt[idx], cc)
            composition_z[0] = [(int(a) - b) % p for a, b in zip(composition_z[0], adj_z)]
            composition_gz[0] = [(int(a) - b) % p for a, b in zip(composition_gz[0], adj_gz)]
            idx += 1
        if aux_polys is not None:
            for c in range(aux_polys.shape[1]):
                poly_ext = aux_polys[:, c]  # (n, d)
                cc = deep_ccs.trace[idx]
                term = vm.emul_scalar(ext, poly_ext, cc)
                composition_z = vm.eadd(ext, composition_z, term)
                composition_gz = vm.eadd(ext, composition_gz, term)
                adj_z = ext.mul(trace_cur[idx], cc)
                adj_gz = ext.mul(trace_nxt[idx], cc)
                composition_z[0] = list(ext.sub(tuple(composition_z[0]), adj_z))
                composition_gz[0] = list(ext.sub(tuple(composition_gz[0]), adj_gz))
                idx += 1
        for j in range(num_cols):
            poly_ext = comp_columns[:, j]
            cc = deep_ccs.constraints[j]
            term = vm.emul_scalar(ext, poly_ext, cc)
            composition_z = vm.eadd(ext, composition_z, term)
            composition_gz = vm.eadd(ext, composition_gz, term)
            adj_z = ext.mul(quot_cur[j], cc)
            adj_gz = ext.mul(quot_nxt[j], cc)
            composition_z[0] = list(ext.sub(tuple(composition_z[0]), adj_z))
            composition_gz[0] = list(ext.sub(tuple(composition_gz[0]), adj_gz))

        # divide by (x − z), (x − z·g) and add (composer/mod.rs:186-199)
        qz = polynom.syn_div(ext, vm.totuples(composition_z), 1, z)
        qgz = polynom.syn_div(ext, vm.totuples(composition_gz), 1, zg)
        deep_coeffs = polynom.add(ext, qz, qgz)
        assert polynom.degree_of(ext, deep_coeffs) == n - 2, (
            "DEEP composition polynomial degree mismatch"
        )

        # 5 ----- evaluate DEEP composition polynomial over LDE domain -------
        deep_arr = vm.asarray(deep_coeffs + [ext.zero()])  # pad back to n
        deep_evaluations = ntt.evaluate_poly_with_offset(base, deep_arr, offset, blowup)

        phases.mark("build_and_evaluate_deep_poly")

        # 6 ----- compute FRI layers ----------------------------------------
        fri_options = FriOptions(
            blowup, air.options.fri_folding_factor, air.options.fri_remainder_max_degree)
        fri_prover = FriProver(ext, fri_options, self.hasher, offset)
        fri_prover.build_layers(channel, deep_evaluations)

        phases.mark("compute_fri_layers")

        # 7 ----- determine query positions ---------------------------------
        channel.grind_query_seed()
        query_positions = channel.get_query_positions()

        phases.mark("determine_query_positions")

        # 8 ----- build proof object ----------------------------------------
        fri_proof = fri_prover.build_proof(query_positions)
        trace_queries = [main_committed.query(query_positions)]
        if aux_committed is not None:
            trace_queries.append(aux_committed.query(query_positions))
        constraint_queries = constraint_committed.query(query_positions)

        proof = channel.build_proof(
            trace_queries, constraint_queries, fri_proof, len(query_positions))
        phases.mark("build_proof_object")
        return proof
