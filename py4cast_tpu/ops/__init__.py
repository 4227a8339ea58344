from py4cast_tpu.ops.graph_ops import (  # noqa: F401
    build_table,
    edge_aggregate,
    gather_nodes,
)
