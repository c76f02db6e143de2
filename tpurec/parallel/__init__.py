from tpurec.parallel.mesh import make_mesh, Shardings
from tpurec.parallel.embedding import shard_table, sharded_embedding_lookup
from tpurec.parallel.feed import GlobalBatchFeed, epoch_plan, process_shard
