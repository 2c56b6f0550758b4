from .stats import stats_dict, stats_json  # noqa: F401
