"""Input-guard tests (reference X1 eager stopifnot validation,
R/main.R:106-116, 648, 682)."""

import pytest

from seraster_spark import permutate, rasterize
from seraster_spark.bbox import compute_bbox
from seraster_spark.datasets import union_datasets


def test_invalid_fun_rejected(spark, docs):
    with pytest.raises(ValueError, match="fun"):
        rasterize.rasterize_cell_type(docs, 100.0, fun="median")
    with pytest.raises(ValueError, match="fun"):
        rasterize.rasterize_gene_expression(docs, 100.0, fun="max")


def test_missing_coord_columns_rejected(spark, docs):
    with pytest.raises(ValueError, match="coordinate columns"):
        permutate.permutate_by_rotation(docs.drop("x"), n_perm=2)


def test_empty_bbox_rejected(spark, docs):
    with pytest.raises(ValueError, match="empty"):
        compute_bbox(docs.limit(0))


def test_empty_dataset_dict_rejected(spark):
    with pytest.raises(ValueError, match="non-empty"):
        union_datasets({})


def test_invalid_nperm_rejected():
    with pytest.raises(ValueError, match="n_perm"):
        permutate.angle_schedule(0)
