from .schedules import (build_chained_generation_schedules, cosine_schedule,
                        linear_schedule, linear_temp_schedule,
                        onex_temp_schedule)
from .sampler import (GenerationSampler, init_empty_target_modality,
                      init_full_input_modality)
