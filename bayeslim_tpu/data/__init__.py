"""Data containers and IO."""
from .containers import (
    TensorData, VisData, MapData, CalData,
    concat_VisData, concat_MapData, concat_CalData, load_data,
)
from .dataset import Dataset
from . import io
from . import uvdata_interface
