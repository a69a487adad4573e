"""Command-line parser (reference src/client/Setup.cpp FSM).

Grammar:
  inputs [fileopts] outputs [fileopts]
      [-v var [varopts]
          [-d downscaler [opts] [-p parameters [opts]]]
          [-c calibrator [opts] [-p parameters [opts]]]*
      ]+
"""
from __future__ import annotations

from dataclasses import dataclass, field

from .options import Options
from .file import File
from .parameter_file import get_parameter_file
from .schemes import Calibrator, Downscaler


@dataclass
class VariableConfiguration:
    variable: str
    variable_options: Options
    downscaler: object = None
    calibrators: list = field(default_factory=list)  # (calibrator, parfile)
    downscaler_parameters: object = None


class Setup:
    def __init__(self, argv):
        self.input_names = []
        self.output_names = []
        self.variable_configurations: list[VariableConfiguration] = []

        # FSM states (Setup.cpp:90-99)
        START, INPUT_OPT, OUTPUT, OUTPUT_OPT, VAR, VAR_OPT, DOWN, DOWN_OPT, \
            CAL, CAL_OPT, PAR, PAR_OPT = range(12)
        state = START
        current_var = None
        current_tokens = []
        current_name = None
        pending_par_target = None  # 'd' or 'c'

        def flush_options():
            return Options(current_tokens)

        i = 0
        argv = list(argv)
        if len(argv) < 2:
            raise RuntimeError("Too few arguments")
        self.input_names = argv[0].split(",")
        i = 1
        # input file options until the output token (first token without =)
        in_opts = []
        while i < len(argv) and "=" in argv[i]:
            in_opts.append(argv[i])
            i += 1
        self.input_options = Options(in_opts)
        if i >= len(argv):
            raise RuntimeError("Missing output file")
        self.output_names = argv[i].split(",")
        i += 1
        out_opts = []
        while i < len(argv) and "=" in argv[i]:
            out_opts.append(argv[i])
            i += 1
        self.output_options = Options(out_opts)

        def finish_scheme():
            nonlocal current_name, current_tokens, pending_par_target
            opts = Options(current_tokens)
            if state_box[0] == DOWN_OPT and current_name:
                current_var.downscaler = Downscaler.get_scheme(
                    current_name, current_var.variable, opts)
            elif state_box[0] == CAL_OPT and current_name:
                current_var.calibrators.append(
                    [Calibrator.get_scheme(current_name,
                                           current_var.variable, opts),
                     None])
            elif state_box[0] == PAR_OPT and current_name:
                par = get_parameter_file(current_name, opts)
                if pending_par_target == "c" and current_var.calibrators:
                    current_var.calibrators[-1][1] = par
                elif pending_par_target == "d":
                    current_var.downscaler_parameters = par
            current_name = None
            current_tokens = []

        state_box = [START]
        while i < len(argv):
            tok = argv[i]
            if tok == "-v":
                finish_scheme()
                i += 1
                name = argv[i]
                var_opts = []
                i += 1
                while i < len(argv) and "=" in argv[i]:
                    var_opts.append(argv[i])
                    i += 1
                current_var = VariableConfiguration(name, Options(var_opts))
                self.variable_configurations.append(current_var)
                state_box[0] = VAR
                continue
            if current_var is None:
                raise RuntimeError(f"Unexpected token '{tok}' before -v")
            if tok == "-d":
                finish_scheme()
                i += 1
                current_name = argv[i]
                state_box[0] = DOWN_OPT
                pending_par_target = "d"
                i += 1
                continue
            if tok == "-c":
                finish_scheme()
                i += 1
                current_name = argv[i]
                state_box[0] = CAL_OPT
                pending_par_target = "c"
                i += 1
                continue
            if tok == "-p":
                finish_scheme()
                i += 1
                current_name = argv[i]
                state_box[0] = PAR_OPT
                i += 1
                continue
            if "=" in tok:
                current_tokens.append(tok)
                i += 1
                continue
            raise RuntimeError(f"Unexpected token '{tok}'")
        finish_scheme()

        for vc in self.variable_configurations:
            if vc.downscaler is None:
                vc.downscaler = Downscaler.get_scheme(
                    "nearestNeighbour", vc.variable, Options())
