"""The STARK verifier — mirror of verifier/src/lib.rs:82-318.

Pure host-side field math: no FFTs, a handful of field ops per query. The
verifier doubles as the framework's fault detector (SURVEY §5.3): any
corrupted prover output fails one of its checks.
"""

from __future__ import annotations

from typing import List, Optional

from ..air.air import EvaluationFrame
from ..air.proof import Proof
from ..crypto.merkle import BatchMerkleProof, MerkleTree
from ..crypto.random_coin import DefaultRandomCoin
from ..fri import DefaultVerifierChannel, FriOptions, FriVerifier
from ..math import polynom, vecmath as vm
from ..math.fields import Field
from ..ops.host import HostOps

__all__ = ["verify", "AcceptableOptions", "VerifierError"]


class VerifierError(Exception):
    pass


class AcceptableOptions:
    """Protocol-parameter acceptance policy (verifier/src/lib.rs:324-362):
    either a minimal security level (conjectured or proven) or an explicit
    set of acceptable ProofOptions."""

    def __init__(self, *, min_conjectured_security: Optional[int] = None,
                 min_proven_security: Optional[int] = None,
                 option_set: Optional[list] = None):
        assert (min_conjectured_security, min_proven_security,
                option_set).count(None) == 2, "exactly one policy must be given"
        self.min_conjectured_security = min_conjectured_security
        self.min_proven_security = min_proven_security
        self.option_set = option_set

    def validate(self, proof: Proof, hasher) -> None:
        if self.min_conjectured_security is not None:
            level = proof.conjectured_security(hasher)
            if not level.is_at_least(self.min_conjectured_security):
                raise VerifierError(
                    f"insufficient conjectured security: {level.bits} < "
                    f"{self.min_conjectured_security}")
        elif self.min_proven_security is not None:
            level = proof.proven_security(hasher)
            if not level.is_at_least(self.min_proven_security):
                raise VerifierError(
                    f"insufficient proven security: "
                    f"{max(level.list_decoding, level.unique_decoding)} < "
                    f"{self.min_proven_security}")
        elif proof.options not in self.option_set:
            raise VerifierError("proof options not in acceptable set")


def evaluate_constraints(air, constraint_coeffs, main_frame: EvaluationFrame,
                         aux_frame: Optional[EvaluationFrame],
                         aux_rand_elements, x: tuple) -> tuple:
    """Evaluate all constraints at the OOD point (verifier/src/evaluator.rs:15-86).
    Frames hold (1, d) arrays in the extension field."""
    ext = air.ext_field
    ops = HostOps(ext)
    t_constraints = air.get_transition_constraints(constraint_coeffs.transition)

    # periodic column values at x
    periodic_values = []
    for poly in air.get_periodic_column_polys():
        num_cycles = air.trace_length // len(poly)
        xp = ext.exp(x, num_cycles)
        val = polynom.eval_poly(ext, [ext.from_base(c) for c in poly], xp)
        periodic_values.append(ops.lift(val))

    main_evals_arr = air.evaluate_transition(main_frame, periodic_values, ops)
    main_evals = [vm.totuples(e)[0] for e in main_evals_arr]

    aux_evals = []
    if aux_frame is not None:
        aux_evals_arr = air.evaluate_aux_transition(
            main_frame, aux_frame, periodic_values, aux_rand_elements, ops)
        aux_evals = [vm.totuples(e)[0] for e in aux_evals_arr]

    result = t_constraints.combine_evaluations(ext, main_evals, aux_evals, x)

    # boundary constraints
    b_constraints = air.get_boundary_constraints(
        aux_rand_elements, constraint_coeffs.boundary)
    main_current = [vm.totuples(main_frame.current(i))[0]
                    for i in range(main_frame.width)]
    for group in b_constraints.main_groups:
        num = group.evaluate_at(ext, x, main_current)
        result = ext.add(result, ext.div(num, group.divisor.evaluate_at(ext, x)))
    if aux_frame is not None:
        aux_current = [vm.totuples(aux_frame.current(i))[0]
                       for i in range(aux_frame.width)]
        for group in b_constraints.aux_groups:
            num = group.evaluate_at(ext, x, aux_current)
            result = ext.add(result, ext.div(num, group.divisor.evaluate_at(ext, x)))
    return result


def verify(air_class, proof: Proof, pub_inputs, hasher,
           acceptable_options: "AcceptableOptions | None" = None) -> None:
    """Full verification (verifier/src/lib.rs:82-318). Raises VerifierError on
    any inconsistency."""
    if acceptable_options is not None:
        acceptable_options.validate(proof, hasher)
    base = proof.context.base_field()
    base_field = Field(base, 1)

    air = air_class(proof.trace_info, pub_inputs, proof.options)
    if air.base is not base:
        raise VerifierError("proof field does not match AIR base field")
    ext = air.ext_field

    # public coin seed = context elements ‖ public inputs (lib.rs:100-101)
    seed = proof.context.to_elements(base_field) + list(air.pub_inputs_to_elements())
    coin = DefaultRandomCoin(hasher, seed, base_field)

    # parse commitments
    lde_domain_size = air.lde_domain_size
    fri_options = FriOptions(
        air.options.blowup_factor, air.options.fri_folding_factor,
        air.options.fri_remainder_max_degree)
    num_fri_layers = fri_options.num_fri_layers(lde_domain_size)
    try:
        trace_roots, constraint_root, fri_roots = proof.commitments.parse(
            hasher.digest_size, air.trace_info.num_segments, num_fri_layers)
    except Exception as e:
        raise VerifierError(f"commitment parsing failed: {e}")

    # 1 ----- trace commitment(s) ----------------------------------------
    coin.reseed(trace_roots[0])
    aux_rand_elements = None
    if air.trace_info.is_multi_segment:
        aux_rand_elements = air.get_aux_rand_elements(coin)
        coin.reseed(trace_roots[1])
    constraint_coeffs = air.get_constraint_composition_coefficients(coin)

    # 2 ----- constraint commitment ---------------------------------------
    coin.reseed(constraint_root)
    z = coin.draw(ext)

    # 3 ----- OOD consistency check ---------------------------------------
    main_width = air.trace_info.main_segment_width
    aux_width = air.trace_info.aux_segment_width
    num_quotients = air.context.num_constraint_composition_columns()
    try:
        trace_cur, trace_nxt, quot_cur, quot_nxt = proof.ood_frame.parse(
            ext, main_width, aux_width, num_quotients)
    except Exception as e:
        raise VerifierError(f"OOD frame parsing failed: {e}")

    ops = HostOps(ext)
    main_frame = EvaluationFrame(
        [ops.lift(v) for v in trace_cur[:main_width]],
        [ops.lift(v) for v in trace_nxt[:main_width]])
    aux_frame = None
    if aux_width:
        aux_frame = EvaluationFrame(
            [ops.lift(v) for v in trace_cur[main_width:]],
            [ops.lift(v) for v in trace_nxt[main_width:]])

    ood_eval_1 = evaluate_constraints(
        air, constraint_coeffs, main_frame, aux_frame, aux_rand_elements, z)

    # H(z) = Σ z^{i·n}·H_i(z) (lib.rs:228-237)
    n = air.trace_length
    ood_eval_2 = ext.zero()
    for i, value in enumerate(quot_cur):
        ood_eval_2 = ext.add(ood_eval_2, ext.mul(ext.exp(z, i * n), value))
    if ood_eval_1 != ood_eval_2:
        raise VerifierError("inconsistent OOD constraint evaluations")

    merged = trace_cur + quot_cur + trace_nxt + quot_nxt
    coin.reseed(hasher.hash_elements(merged, ext))

    # 4 ----- FRI commitments ---------------------------------------------
    deep_coefficients = air.get_deep_composition_coefficients(coin)
    layer_alphas = []
    for root in fri_roots:
        coin.reseed(root)
        layer_alphas.append(coin.draw(ext))
    fri_verifier = FriVerifier(
        ext, fri_options, air.context.trace_poly_degree, fri_roots, layer_alphas,
        air.domain_offset)

    # 5 ----- PoW + query positions ---------------------------------------
    if coin.check_leading_zeros(proof.pow_nonce) < air.options.grinding_factor:
        raise VerifierError("query seed proof-of-work verification failed")
    positions = coin.draw_integers(
        air.options.num_queries, lde_domain_size, proof.pow_nonce)
    positions = sorted(set(positions))
    if len(positions) != proof.num_unique_queries:
        raise VerifierError("number of unique queries mismatch")

    # read queried trace/constraint states, verifying batch Merkle proofs
    # (verifier/src/channel.rs:196-272)
    part_opts = air.options.partition_options

    def _leaf_hash(row, field_: Field):
        """Row digest, honoring partitioned hashing (row_matrix.rs:184-229)."""
        psize = part_opts.partition_size(len(row), field_.degree)
        if psize >= len(row):
            return hasher.hash_elements(row, field_)
        chunks = [row[i : i + psize] for i in range(0, len(row), psize)]
        return hasher.merge_many(
            [hasher.hash_elements(c, field_) for c in chunks])

    def read_queries(queries, field_: Field, values_per_query: int, root: bytes):
        try:
            proof_bytes, rows = queries.parse(
                field_, lde_domain_size, len(positions), values_per_query)
            batch_proof = BatchMerkleProof.from_bytes(proof_bytes, hasher.digest_size)
            leaves = [_leaf_hash(row, field_) for row in rows]
            MerkleTree.verify_batch(root, positions, leaves, batch_proof, hasher)
        except VerifierError:
            raise
        except Exception as e:
            raise VerifierError(f"query verification failed: {e}")
        return rows

    main_states = read_queries(
        proof.trace_queries[0], base_field, main_width, trace_roots[0])
    aux_states = None
    if aux_width:
        aux_states = read_queries(
            proof.trace_queries[1], ext, aux_width, trace_roots[1])
    constraint_states = read_queries(
        proof.constraint_queries, ext, num_quotients, constraint_root)

    # 6 ----- DEEP composition (verifier/src/composer.rs:17-160) -----------
    p = base.p
    g_lde = air.lde_domain_generator
    offset = air.domain_offset
    g_trace = air.trace_domain_generator
    zg = ext.mul_base(z, g_trace)
    x_coords = [pow(g_lde, pos, p) * offset % p for pos in positions]

    deep_evaluations = []
    result_num = []
    result_den = []
    for j, x in enumerate(x_coords):
        xe = ext.from_base(x)
        t1_den = ext.sub(xe, z)
        t2_den = ext.sub(xe, zg)
        t1_num = ext.zero()
        t2_num = ext.zero()
        for i in range(main_width):
            value = ext.from_base(main_states[j][i][0])
            cc = deep_coefficients.trace[i]
            t1_num = ext.add(t1_num, ext.mul(ext.sub(value, trace_cur[i]), cc))
            t2_num = ext.add(t2_num, ext.mul(ext.sub(value, trace_nxt[i]), cc))
        if aux_width:
            for i in range(aux_width):
                value = aux_states[j][i]
                cc = deep_coefficients.trace[main_width + i]
                t1_num = ext.add(
                    t1_num, ext.mul(ext.sub(value, trace_cur[main_width + i]), cc))
                t2_num = ext.add(
                    t2_num, ext.mul(ext.sub(value, trace_nxt[main_width + i]), cc))
        for i in range(num_quotients):
            value = constraint_states[j][i]
            cc = deep_coefficients.constraints[i]
            t1_num = ext.add(t1_num, ext.mul(ext.sub(value, quot_cur[i]), cc))
            t2_num = ext.add(t2_num, ext.mul(ext.sub(value, quot_nxt[i]), cc))
        result_num.append(
            ext.add(ext.mul(t1_num, t2_den), ext.mul(t2_num, t1_den)))
        result_den.append(ext.mul(t1_den, t2_den))

    for num, den in zip(result_num, result_den):
        deep_evaluations.append(ext.div(num, den))

    # 7 ----- FRI verification --------------------------------------------
    try:
        fri_channel = DefaultVerifierChannel(
            proof.fri_proof, fri_roots, lde_domain_size,
            air.options.fri_folding_factor, ext, hasher)
        fri_verifier.verify(fri_channel, deep_evaluations, positions)
    except VerifierError:
        raise
    except Exception as e:
        raise VerifierError(f"FRI verification failed: {e}")
