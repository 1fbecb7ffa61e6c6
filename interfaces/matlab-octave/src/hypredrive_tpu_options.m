function yaml = hypredrive_tpu_options(opts)
%HYPREDRIVE_TPU_OPTIONS  Convert an options struct to YAML text.
%   YAML = HYPREDRIVE_TPU_OPTIONS(OPTS) emits the hypredrive YAML
%   configuration for a (nested) struct, e.g.
%     opts.solver.pcg.max_iter = 200;
%     opts.preconditioner = 'amg';
%   (ref: interfaces/matlab-octave/src/hypredrive_options.m — same
%   struct->YAML contract).
  if ~isstruct(opts)
    error('hypredrive_tpu:options', 'opts must be a struct');
  end
  yaml = ['linear_system:', sprintf('\n'), emit(opts, 0)];
end

function out = emit(s, depth)
  out = '';
  pad = repmat('  ', 1, depth);
  names = fieldnames(s);
  for k = 1:numel(names)
    key = names{k};
    val = s.(key);
    if isstruct(val)
      out = [out, pad, key, ':', sprintf('\n'), emit(val, depth + 1)];
    elseif ischar(val)
      out = [out, pad, key, ': ', val, sprintf('\n')];
    elseif islogical(val)
      tf = {'off', 'on'};
      out = [out, pad, key, ': ', tf{val + 1}, sprintf('\n')];
    elseif isnumeric(val) && isscalar(val)
      if val == round(val)
        out = [out, pad, key, ': ', sprintf('%d', val), sprintf('\n')];
      else
        out = [out, pad, key, ': ', sprintf('%.16g', val), sprintf('\n')];
      end
    elseif isnumeric(val)
      out = [out, pad, key, ': [', ...
             strtrim(sprintf('%g, ', val)), ']', sprintf('\n')];
      out = strrep(out, ', ]', ']');
    else
      error('hypredrive_tpu:options', 'unsupported value for %s', key);
    end
  end
end
