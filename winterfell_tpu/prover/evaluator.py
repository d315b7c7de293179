"""Constraint evaluation over the CE domain
(prover/src/constraints/evaluator/default.rs + evaluation_table.rs).

Instead of the reference's per-row closure loop, the whole CE domain is
evaluated with vectorized field ops: the AIR's ``evaluate_transition`` is
called once with column arrays covering every CE row (TPU-first — the same
shape the device engine consumes). Divisor inverses are computed by batch
inversion exploiting the coset periodicity of (x^a − b)
(evaluation_table.rs:318-430).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..air.air import EvaluationFrame
from ..air.divisor import ConstraintDivisor
from ..math import ntt, vecmath as vm
from ..math.fields import Field
from ..ops.host import HostOps


def evaluate_divisor_numerator(base, ce_size: int, offset: int, a: int, b: int
                               ) -> np.ndarray:
    """(x^a − b) over the CE coset: x_i^a = offset^a · (h^a)^i is a geometric
    series, so the values are a power series (period ce/gcd)."""
    p = base.p
    h = ntt.get_root(base, ce_size)
    ratio = pow(h, a, p)
    start = pow(offset % p, a, p)
    vals = vm.power_series(base, ratio, ce_size, offset=start)
    return (vals - b) % p


class DefaultConstraintEvaluator:
    def __init__(self, air, aux_rand_elements, composition_coefficients):
        self.air = air
        self.aux_rand_elements = aux_rand_elements
        self.ccs = composition_coefficients

    def evaluate(self, main_polys: np.ndarray,
                 aux_polys: Optional[np.ndarray]) -> np.ndarray:
        """`main_polys`: (n, w) base coeffs; `aux_polys`: (n, w_aux, d) or None.
        Returns the combined CE-domain column (ce, d)."""
        air = self.air
        base = air.base
        p = base.p
        ext = air.ext_field
        d = ext.degree
        n = air.trace_length
        ce_blowup = air.ce_blowup_factor
        ce = air.context.ce_domain_size
        offset = air.domain_offset

        # ---- trace evaluations over the CE domain --------------------------
        main_ce = ntt.evaluate_poly_with_offset(base, main_polys, offset, ce_blowup)
        # next row: x·g on the CE coset = index shift by ce_blowup (wraparound)
        main_ce_next = np.roll(main_ce, -ce_blowup, axis=0)

        base_field = Field(base, 1)
        ops_main = HostOps(base_field)
        frame_cur = [main_ce[:, c : c + 1] for c in range(main_ce.shape[1])]
        frame_nxt = [main_ce_next[:, c : c + 1] for c in range(main_ce.shape[1])]
        main_frame = EvaluationFrame(frame_cur, frame_nxt)

        # ---- periodic column values over the CE domain ---------------------
        periodic = []
        for poly in air.get_periodic_column_polys():
            c = len(poly)
            coeffs = vm.base_asarray(poly)[:, None]
            period_vals = ntt.evaluate_poly_with_offset(
                base, coeffs, pow(offset, n // c, p), ce_blowup)  # (c·ce_blowup, 1)
            reps = ce // period_vals.shape[0]
            periodic.append(np.tile(period_vals, (reps, 1)))

        # ---- transition constraints ----------------------------------------
        main_evals = air.evaluate_transition(main_frame, periodic, ops_main)
        assert len(main_evals) == len(air.context.main_degrees)

        t_ccs = self.ccs.transition
        combined = vm.zeros((ce, d))
        for ev, cc in zip(main_evals, t_ccs[: len(main_evals)]):
            # base eval × extension coefficient
            contrib = ev * np.array(list(cc), dtype=object)[None, :] % p
            combined = (combined + contrib) % p

        # ---- aux transition constraints ------------------------------------
        if aux_polys is not None:
            aux_ce = ntt.evaluate_poly_with_offset(base, aux_polys, offset, ce_blowup)
            aux_ce_next = np.roll(aux_ce, -ce_blowup, axis=0)
            ops_ext = HostOps(ext)
            # lift main frame and periodic values into the extension field
            lift = lambda a: vm.base_to_ext(ext, a[:, 0])
            main_frame_ext = EvaluationFrame(
                [lift(a) for a in frame_cur], [lift(a) for a in frame_nxt])
            periodic_ext = [lift(pv) for pv in periodic]
            aux_frame = EvaluationFrame(
                [aux_ce[:, c] for c in range(aux_ce.shape[1])],
                [aux_ce_next[:, c] for c in range(aux_ce.shape[1])],
            )
            aux_evals = air.evaluate_aux_transition(
                main_frame_ext, aux_frame, periodic_ext,
                self.aux_rand_elements, ops_ext)
            assert len(aux_evals) == len(air.context.aux_degrees)
            for ev, cc in zip(aux_evals, t_ccs[len(main_evals):]):
                combined = vm.eadd(ext, combined, vm.emul_scalar(ext, ev, cc))

        # ---- divide by the transition divisor ------------------------------
        divisor = ConstraintDivisor.from_transition(
            base, n, air.context.num_transition_exemptions)
        num_vals = evaluate_divisor_numerator(base, ce, offset, n, 1)
        inv_num = vm.batch_inversion_base(base, num_vals)
        # multiply exemptions (x − e) back into the numerator side
        xs = vm.power_series(base, ntt.get_root(base, ce), ce, offset=offset)
        exempt = np.ones(ce, dtype=object)
        for e in divisor.exemptions:
            exempt = exempt * ((xs - e) % p) % p
        t_div = inv_num * exempt % p
        result = combined * t_div[:, None] % p

        # ---- boundary constraints ------------------------------------------
        boundary = air.get_boundary_constraints(self.aux_rand_elements, self.ccs.boundary)
        for group in boundary.main_groups:
            col = self._eval_boundary_group(
                group, main_ce, None, base, ext, ce, offset, xs)
            result = (result + col) % p
        if aux_polys is not None:
            for group in boundary.aux_groups:
                col = self._eval_boundary_group(
                    group, None, aux_ce, base, ext, ce, offset, xs)
                result = (result + col) % p

        return result

    def _eval_boundary_group(self, group, main_ce, aux_ce, base, ext: Field,
                             ce: int, offset: int, xs: np.ndarray) -> np.ndarray:
        """One divisor group: Σ cc_j·(T_j(x) − b_j(x)) / z(x) over the domain."""
        p = base.p
        d = ext.degree
        numer = vm.zeros((ce, d))
        for c in group.constraints:
            if main_ce is not None:
                trace_vals = main_ce[:, c.column]  # (ce,) base
                b_vals = self._eval_value_poly_base(c, base, ce, offset)
                diff = (trace_vals - b_vals) % p  # (ce,)
                contrib = diff[:, None] * np.array(list(c.cc), dtype=object)[None, :] % p
            else:
                trace_vals = aux_ce[:, c.column]  # (ce, d) ext
                b_vals = self._eval_value_poly_ext(c, ext, ce, offset)
                diff = vm.esub(ext, trace_vals, b_vals)
                contrib = vm.emul_scalar(ext, diff, c.cc)
            numer = (numer + contrib) % p

        # divisor (x^k − b0), no exemptions for assertion divisors
        (a, b0), = group.divisor.numerator
        div_vals = evaluate_divisor_numerator(base, ce, offset, a, b0)
        inv_div = vm.batch_inversion_base(base, div_vals)
        return numer * inv_div[:, None] % p

    @staticmethod
    def _eval_value_poly_base(c, base, ce: int, offset: int) -> np.ndarray:
        """b_j(x·poly_offset) over the CE coset, base-field polynomial.
        Coefficients are zero-padded to the CE size so the whole evaluation is
        one NTT instead of ce/k tiny ones."""
        p = base.p
        if len(c.poly) == 1:
            return np.full(ce, c.poly[0][0] % p, dtype=object)
        coeffs = vm.zeros((ce, 1))
        for i, v in enumerate(c.poly):
            coeffs[i, 0] = v[0]
        evals = ntt.evaluate_poly_with_offset(
            base, coeffs, offset * c.poly_offset % p, 1)
        return evals[:, 0]

    @staticmethod
    def _eval_value_poly_ext(c, ext: Field, ce: int, offset: int) -> np.ndarray:
        base = ext.base
        p = base.p
        if len(c.poly) == 1:
            out = vm.zeros((ce, ext.degree))
            out[:] = np.array(list(c.poly[0]), dtype=object)[None, :]
            return out
        coeffs = vm.zeros((ce, ext.degree))
        for i, v in enumerate(c.poly):
            coeffs[i, : len(v)] = list(v)
        return ntt.evaluate_poly_with_offset(
            base, coeffs, offset * c.poly_offset % p, 1)
