from .scores import (  # noqa: F401
    ACC3, ACC7, accuracy_score, f1_score_weighted, mcnemar_test,
    misa_report, multiclass_acc, pearson_corr, test_ce_score, test_mse_score,
)
