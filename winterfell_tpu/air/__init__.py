"""Protocol description layer: AIR, options, trace metadata, proof containers."""

from .air import Air, EvaluationFrame, TransitionConstraints
from .assertions import Assertion, AssertionError_, prepare_assertions
from .boundary import BoundaryConstraint, BoundaryConstraintGroup, BoundaryConstraints
from .coefficients import ConstraintCompositionCoefficients, DeepCompositionCoefficients
from .context import AirContext
from .divisor import ConstraintDivisor
from .options import BatchingMethod, FieldExtension, PartitionOptions, ProofOptions
from .trace_info import TraceInfo
from .transition import TransitionConstraintDegree

__all__ = [
    "Air",
    "AirContext",
    "Assertion",
    "AssertionError_",
    "BatchingMethod",
    "BoundaryConstraint",
    "BoundaryConstraintGroup",
    "BoundaryConstraints",
    "ConstraintCompositionCoefficients",
    "ConstraintDivisor",
    "DeepCompositionCoefficients",
    "EvaluationFrame",
    "FieldExtension",
    "PartitionOptions",
    "ProofOptions",
    "TraceInfo",
    "TransitionConstraintDegree",
    "TransitionConstraints",
    "prepare_assertions",
]
