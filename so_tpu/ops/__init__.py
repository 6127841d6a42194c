from .grid import CellGrid, build_grid, morton_encode  # noqa: F401
from .gather import ragged_ball_gather, GatherResult  # noqa: F401
