from .event_readers import (
    FixedSizeEventReader,
    RefTimeEventReaderZip,
    SingleEventReaderNpz,
)
from .io import (
    ErrorMapWriter,
    EvalWriter,
    EventWriter,
    FlowWriter,
    ImageWriter,
    VideoWriter,
    make_event_preview,
    merge_optical_flow,
)
from .train_loader import StackedSequenceLoader, TrainSequenceDataset
from .video_readers import VR, ImageReader, VideoReader, read_timestamps_file
