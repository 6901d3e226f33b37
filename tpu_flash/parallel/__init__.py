from tpu_flash.parallel.mesh import make_mesh
from tpu_flash.parallel.ring import ring_attention, ring_dense_fa, merge_partials
from tpu_flash.parallel.ulysses import ulysses_attention, ulysses_fa
