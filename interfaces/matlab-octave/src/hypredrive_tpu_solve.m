function x = hypredrive_tpu_solve(A, b, opts)
%HYPREDRIVE_TPU_SOLVE  One-shot sparse solve through hypredrive_tpu.
%   x = HYPREDRIVE_TPU_SOLVE(A, b) solves A*x = b with the default
%   PCG + AMG configuration.
%   x = HYPREDRIVE_TPU_SOLVE(A, b, OPTS) takes either a YAML char array
%   or an options struct (see HYPREDRIVE_TPU_OPTIONS).
%
%   Mirrors the reference front end (ref: interfaces/matlab-octave/src/
%   hypredrive_solve.m) over the hypredrive_tpu C shim.
  if nargin < 3
    x = hypredrive_tpu_mex(A, b);
  elseif ischar(opts) || (exist('isstring', 'builtin') && isstring(opts))
    x = hypredrive_tpu_mex(A, b, char(opts));
  else
    x = hypredrive_tpu_mex(A, b, hypredrive_tpu_options(opts));
  end
end
