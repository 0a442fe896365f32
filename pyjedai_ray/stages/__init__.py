"""Dataset -> Dataset stage transforms (the operator layer).

Every stage is a function (or callable-class actor) over ``ray.data.Dataset``
with Arrow batches; no stage owns a Ray session. Canonical schemas are in
``pyjedai_ray.__init__``.
"""
