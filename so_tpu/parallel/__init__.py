from .mesh import (  # noqa: F401
    ShardedGrid,
    build_sharded_grid,
    make_mesh,
    sharded_stage_fn,
    solve_rvir_sharded,
    solve_stage_sharded,
)
