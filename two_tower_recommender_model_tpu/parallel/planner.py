"""Memory-aware embedding sharding planner.

The role of TorchRec's `EmbeddingShardingPlanner` +
`HeuristicalStorageReservation(percentage=0.05)` + plan printout
(`03_model_training.py:797-822`): decide, per table, whether to replicate or
row-shard across the mesh, accounting for HBM, and emit a human-readable plan.

Strategies:
- ``replicated``  — small tables: every device holds a full copy; lookups are
  local, the update all-gathers batch grads and applies the same deterministic
  Adagrad step everywhere (the Composer/DDP path of the reference,
  `pytorch-model-training.py:350-518`).
- ``row_sharded`` — large tables: rows split over the flattened (data, model)
  mesh, padded to a device multiple; lookup/update go through the collectives
  in `parallel/sharded.py` (the DMP path).

The planner is deliberately deterministic given (tables, mesh, budgets), so
every process computes an identical plan — the single-program SPMD answer to
the reference's `collective_plan` cross-rank agreement step
(`03_model_training.py:809-811`).
"""

from __future__ import annotations

import dataclasses

from two_tower_recommender_model_tpu.config import ModelConfig

REPLICATED = "replicated"
ROW_SHARDED = "row_sharded"
COLUMN_SHARDED = "column_sharded"


@dataclasses.dataclass(frozen=True)
class TableShard:
    table: str
    strategy: str
    num_embeddings: int  # logical rows
    padded_rows: int  # physical rows (device multiple for row_sharded)
    embedding_dim: int
    bytes_per_device: int
    padded_dim: int = 0  # physical dim (device multiple, column_sharded only)

    @property
    def rows_per_device(self) -> int:
        return self.padded_rows  # replicated: full copy per device


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    num_devices: int
    specs: dict[str, TableShard]
    hbm_budget_bytes: int | None
    reserve_fraction: float

    def __getitem__(self, table: str) -> TableShard:
        return self.specs[table]

    @property
    def total_bytes_per_device(self) -> int:
        return sum(s.bytes_per_device for s in self.specs.values())

    def describe(self) -> str:
        """Printable plan (the role of the reference's sharding-plan print,
        `03_model_training.py:818-822`)."""
        lines = [
            f"EmbeddingShardingPlan over {self.num_devices} device(s)"
            + (
                f"  [budget {self.hbm_budget_bytes/2**30:.1f} GiB/device,"
                f" reserve {self.reserve_fraction:.0%}]"
                if self.hbm_budget_bytes
                else ""
            ),
            f"{'table':<24}{'strategy':<14}{'rows':>12}{'padded':>12}{'dim':>6}{'MiB/device':>12}",
        ]
        for s in self.specs.values():
            lines.append(
                f"{s.table:<24}{s.strategy:<14}{s.num_embeddings:>12}{s.padded_rows:>12}"
                f"{s.embedding_dim:>6}{s.bytes_per_device/2**20:>12.2f}"
            )
        lines.append(f"{'total':<24}{'':<14}{'':>12}{'':>12}{'':>6}"
                     f"{self.total_bytes_per_device/2**20:>12.2f}")
        return "\n".join(lines)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def plan_sharding(
    model_cfg: ModelConfig,
    num_devices: int,
    hbm_budget_bytes: int | None = None,
    replicate_threshold_bytes: int = 4 << 20,
    reserve_fraction: float = 0.05,
    force: dict[str, str] | None = None,
    bytes_per_param: int = 4,
) -> ShardingPlan:
    """Choose a strategy per table. `force` overrides per-table
    ({table_name: "replicated"|"row_sharded"}). Raises if the plan exceeds the
    HBM budget after the heuristic reserve (the `HeuristicalStorageReservation`
    role)."""
    specs: dict[str, TableShard] = {}
    for t in model_cfg.tables:
        # +1 row: shared sentinel row used by padded/dead lookup slots.
        table_bytes = (t.num_embeddings * t.embedding_dim + t.num_embeddings) * bytes_per_param
        if force and t.name in force:
            strategy = force[t.name]
        elif num_devices == 1 or table_bytes <= replicate_threshold_bytes:
            strategy = REPLICATED
        else:
            strategy = ROW_SHARDED
        padded_dim = t.embedding_dim
        if strategy == ROW_SHARDED:
            padded = _round_up(t.num_embeddings, num_devices)
            per_dev_rows = padded // num_devices
            bytes_per_device = (per_dev_rows * t.embedding_dim + per_dev_rows) * bytes_per_param
        elif strategy == COLUMN_SHARDED:
            padded = t.num_embeddings
            padded_dim = _round_up(t.embedding_dim, num_devices)
            # full acc row vector is replicated per device
            bytes_per_device = (
                t.num_embeddings * (padded_dim // num_devices) + t.num_embeddings
            ) * bytes_per_param
        else:
            padded = t.num_embeddings
            bytes_per_device = table_bytes
        specs[t.name] = TableShard(
            table=t.name,
            strategy=strategy,
            num_embeddings=t.num_embeddings,
            padded_rows=padded,
            embedding_dim=t.embedding_dim,
            bytes_per_device=bytes_per_device,
            padded_dim=padded_dim,
        )
    plan = ShardingPlan(
        num_devices=num_devices,
        specs=specs,
        hbm_budget_bytes=hbm_budget_bytes,
        reserve_fraction=reserve_fraction,
    )
    if hbm_budget_bytes is not None:
        usable = int(hbm_budget_bytes * (1 - reserve_fraction))
        if plan.total_bytes_per_device > usable:
            raise MemoryError(
                f"sharding plan needs {plan.total_bytes_per_device/2**20:.1f} MiB/device, "
                f"budget {usable/2**20:.1f} MiB after {reserve_fraction:.0%} reserve:\n"
                + plan.describe()
            )
    return plan
