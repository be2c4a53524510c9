"""Pure-Python kernels with reference-identical observable output.

No Ray imports allowed in this subpackage: every function here is a
plain scalar/string kernel that the Ray stages call inside
``map_batches`` bodies (compiled patterns are module-level so actor
``__init__``/task import pays the compile cost once).
"""
