from .ca import (
    neighbor_counts,
    apply_rule,
    ca_step_grid,
    pad_action,
)

__all__ = ["neighbor_counts", "apply_rule", "ca_step_grid", "pad_action"]
