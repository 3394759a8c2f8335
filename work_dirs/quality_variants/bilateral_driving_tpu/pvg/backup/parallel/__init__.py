from .data_parallel import make_mesh, parallel_train_step
