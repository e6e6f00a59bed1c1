from .distributed import global_mesh, initialize_distributed, is_distributed
from .mesh import Mesh, NamedSharding, P, chain_sharding, data_sharding, make_mesh
from .sharded import (
    make_sharded_train_step,
    make_sharded_value_and_grad,
    sharded_elbo,
)
