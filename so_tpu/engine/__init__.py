from .solver import solve_rvir, SolveResult, rvir_ladder  # noqa: F401
from .recenter import recenter_most_bound  # noqa: F401
from .conflicts import resolve_conflicts, ConflictState  # noqa: F401
from .derived import compute_derived, DerivedResult  # noqa: F401
from .members import extract_members  # noqa: F401
from .pipeline import SOParams, SORun, run_so  # noqa: F401
