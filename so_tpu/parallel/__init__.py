from .mesh import (  # noqa: F401
    ShardedGrid,
    build_sharded_grid,
    extract_members_sharded,
    make_mesh,
    members_stage_sharded,
    sharded_stage_fn,
    solve_rvir_sharded,
    solve_stage_sharded,
)
