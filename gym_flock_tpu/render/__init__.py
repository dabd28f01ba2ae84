from gym_flock_tpu.render.plot import (
    CoverageRenderer,
    FlockingRenderer,
    FormationRenderer,
    FrameWriter,
    ShepherdingRenderer,
    get_renderer,
)
