from tpurec.parallel.mesh import make_mesh, Shardings
