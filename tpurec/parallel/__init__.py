from tpurec.parallel.mesh import make_mesh, Shardings
from tpurec.parallel.embedding import shard_table, sharded_embedding_lookup
