"""Scale-out: batched scenario planning (vmap) on one chip and mesh-sharded
execution (shard_map + collectives) across chips/hosts."""
