from stinet_tpu.parallel.mesh import make_mesh, graph_sharding, param_sharding
from stinet_tpu.parallel.data_parallel import make_sharded_train_step
